"""Import stub for the reference deepdish.py (hypercorn is not installed)."""
