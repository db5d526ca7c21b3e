"""Application drivers: CLI demo and serving (reference L4 layer)."""
