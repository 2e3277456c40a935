"""Utilities: timers/benchmark facade, checkpointing, export."""
