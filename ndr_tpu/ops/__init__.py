"""Differentiable TO operators: filters, volume constraints, optimizers."""
