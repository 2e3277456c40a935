"""Differential-operator helpers for coordinate fields.

Functional counterparts of the reference's torch-autograd helpers
(reference: utils.py:16-32 gradient/divergence/laplace). The torch
versions differentiate a *tensor* y with respect to the coords tensor it
was computed from (create_graph re-entry per component); in JAX the
natural object is the field *function* itself, so these are function
transforms: pass the scalar/vector field ``fn`` mapping a single
coordinate ``(ndim,) -> ()`` or ``(ndim,) -> (m,)``, get back a function
over batched coordinate arrays ``(..., ndim)``.

Used for PDE-style regularizers on neural density fields (e.g. gradient
penalties on the FF-MLP output); exactness is tested against closed-form
polynomial/trigonometric fields.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _batched(point_op: Callable) -> Callable:
    """Lift a single-point operator to arbitrary leading batch dims."""

    def apply(coords: jnp.ndarray) -> jnp.ndarray:
        flat = coords.reshape(-1, coords.shape[-1])
        out = jax.vmap(point_op)(flat)
        return out.reshape(coords.shape[:-1] + out.shape[1:])

    return apply


def gradient(fn: Callable) -> Callable:
    """``∇f``: scalar field ``fn (ndim,) -> ()`` to its per-point spatial
    gradient over ``(..., ndim)`` coords (reference: utils.gradient)."""
    return _batched(jax.grad(fn))


def divergence(fn: Callable) -> Callable:
    """``∇·v``: vector field ``fn (ndim,) -> (ndim,)`` to its per-point
    divergence, computed as the Jacobian trace with forward-mode AD (one
    JVP per dim — same cost profile as the reference's per-component
    autograd loop, utils.divergence, but with no graph retention)."""

    def point(x: jnp.ndarray) -> jnp.ndarray:
        basis = jnp.eye(x.shape[-1], dtype=x.dtype)
        tangents = jax.vmap(lambda e: jax.jvp(fn, (x,), (e,))[1])(basis)
        return jnp.trace(tangents)

    return _batched(point)


def laplacian(fn: Callable) -> Callable:
    """``Δf = ∇·∇f``: scalar field to its per-point Laplacian
    (forward-over-reverse Hessian trace; reference: utils.laplace)."""

    def point(x: jnp.ndarray) -> jnp.ndarray:
        grad_fn = jax.grad(fn)
        basis = jnp.eye(x.shape[-1], dtype=x.dtype)
        hess_cols = jax.vmap(lambda e: jax.jvp(grad_fn, (x,), (e,))[1])(basis)
        return jnp.trace(hess_cols)

    return _batched(point)


# reference name (utils.laplace)
laplace = laplacian
