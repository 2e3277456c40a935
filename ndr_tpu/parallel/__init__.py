"""Multi-chip domain decomposition over a device mesh."""
