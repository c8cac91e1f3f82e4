"""Readers + deterministic synthetic derivations of the engine's input tables."""
