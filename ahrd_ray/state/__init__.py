"""Checkpoint manifests + per-partition lineage records."""
