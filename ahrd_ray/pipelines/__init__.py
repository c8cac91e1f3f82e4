"""End-to-end Dataset graphs + the driver-facing query registry."""
