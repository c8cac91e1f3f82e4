"""Ray Data stages (map_batches fns + actor classes)."""
