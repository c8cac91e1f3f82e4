"""Pure kernels — importable and testable without Ray."""
