"""Column-expression function libraries (no Python in the hot path)."""
