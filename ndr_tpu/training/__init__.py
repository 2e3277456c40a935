"""End-to-end training drivers (classic SIMP + neural TO)."""
