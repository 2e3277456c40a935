"""Evaluation: resolution transfer, binary compliance, interpolation studies."""
