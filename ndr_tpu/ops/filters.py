"""Density filters, fully differentiable under JAX AD.

Two families, matching the reference exactly:

1. "Solver-side" filters used by the classic SIMP pipeline and the OC
   optimizer (reference: VoxelFEM/TopologyOptimizationFilter.hh):
   - :class:`ProjectionFilter` — normalized tanh Heaviside about 0.5.
   - :class:`SmoothingFilter` — radius-r cube-neighborhood mean with
     *boundary-clipped* stencils (each cell averages over its in-bounds
     neighbors only).
   - :class:`LangelaarFilter` — additive-manufacturing overhang filter,
     a layer-by-layer smin/smax sweep implemented with ``lax.scan``.

   The reference hand-writes backprop for each filter
   (TopologyOptimizationFilter.hh backprop methods); here plain JAX AD
   through the forward pass produces the identical vector-Jacobian
   products, so no adjoint code is needed.

2. "Training-side" filters used by the neural pipeline (reference:
   filtering.py): tanh projection (normalized/unnormalized, centered at
   0), reflect-padded normalized box blur, reflect-padded Gaussian blur,
   plus the adaptive-filtering schedule helpers.

All filters operate on density fields of shape ``grid.dims``.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Solver-side filters (C++ parity)
# ---------------------------------------------------------------------------

class Filter:
    """Filter protocol: ``apply(x) -> x_filtered`` (differentiable)."""

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError


@dataclasses.dataclass
class ProjectionFilter(Filter):
    """Normalized tanh Heaviside projection about 0.5.

    out = 0.5 * (tanh(0.5 b) + tanh(b (x - 0.5))) / tanh(0.5 b)
    (reference: TopologyOptimizationFilter.hh:58-66)
    """

    beta: float = 1.0

    def apply(self, x):
        b = self.beta
        return 0.5 * (jnp.tanh(0.5 * b) + jnp.tanh(b * (x - 0.5))) / jnp.tanh(0.5 * b)


def _box_sum(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sum over the clipped cube window [-r, r]^ndim (zero outside).

    Implemented with an additive ``lax.reduce_window`` (SAME padding)
    rather than shifted pad/slice chains: one fused windowed reduction
    maps directly onto XLA's native lowering on both CPU and TPU, and
    its transpose under AD is the identical windowed scatter the
    reference's explicit sparse-matrix transpose computes.
    """
    win = (2 * radius + 1,) * x.ndim
    # literal 0. init so JAX recognizes the additive monoid (the
    # differentiable windowed-sum special case with a proper transpose)
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, win, (1,) * x.ndim, "SAME")


@dataclasses.dataclass
class SmoothingFilter(Filter):
    """Cube-neighborhood mean with boundary-clipped stencils.

    out[i] = (1/|stencil(i)|) * sum_{k in stencil(i)} x[k], where the
    stencil is the in-bounds part of the radius-r cube around i. The
    normalization by the *clipped* stencil size matches the reference's
    explicit sparse matrix (TopologyOptimizationFilter.hh:136-150), and
    JAX AD through this expression reproduces its transpose backprop.
    """

    radius: int = 1

    def apply(self, x):
        r = int(round(self.radius))
        if r <= 0:
            return x
        return _box_sum(x, r) / _box_sum(jnp.ones_like(x), r)


@dataclasses.dataclass
class LangelaarFilter(Filter):
    """Additive-manufacturing overhang filter (Langelaar 2017).

    Sweeps layers along the *last* axis (the build direction): a voxel can
    be no denser than an smax-approximate maximum of its supporting voxels
    in the layer below (directly below + side-below neighbors), combined
    through a smooth min.

    (reference: TopologyOptimizationFilter.hh:167-278; supporting region
     from NDVector::visitSupportingRegion — below + one-sided neighbors in
     each non-build dimension)
    """

    P: float = 40.0
    Q: float = 40.0 - 1.58
    epsilon: float = 1e-4

    def _smax_support(self, below: jnp.ndarray) -> jnp.ndarray:
        """P-norm 'max' over the supporting region of each voxel.

        ``below``: previous layer's printed densities, shape dims[:-1].
        """
        p = jnp.abs(below) ** self.P
        total = p
        for axis in range(below.ndim):
            shift_lo = jnp.pad(p, [(1, 0) if a == axis else (0, 0) for a in range(p.ndim)])[
                tuple(slice(0, p.shape[a]) if a == axis else slice(None) for a in range(p.ndim))
            ]
            shift_hi = jnp.pad(p, [(0, 1) if a == axis else (0, 0) for a in range(p.ndim)])[
                tuple(slice(1, None) if a == axis else slice(None) for a in range(p.ndim))
            ]
            total = total + shift_lo + shift_hi
        return total ** (1.0 / self.Q)

    def _smin(self, x1, x2):
        return 0.5 * (
            x1 + x2 - jnp.sqrt((x1 - x2) ** 2 + self.epsilon) + jnp.sqrt(self.epsilon)
        )

    def apply(self, x):
        # move build axis (last) to scan position
        layers = jnp.moveaxis(x, -1, 0)  # (n_layers, dims[:-1])

        def step(prev_out, layer_in):
            smax = self._smax_support(prev_out)
            out = self._smin(layer_in, smax)
            return out, out

        first = layers[0]
        _, rest = jax.lax.scan(step, first, layers[1:])
        out = jnp.concatenate([first[None], rest], axis=0)
        return jnp.moveaxis(out, 0, -1)


def apply_filter_chain(x: jnp.ndarray, filters: Sequence[Filter]) -> jnp.ndarray:
    """Apply filters in order: design -> ... -> physical densities.

    (reference: TopologyOptimizationProblem.hh:56-59 setVars filter chain)
    """
    for f in filters:
        x = f.apply(x)
    return x




@dataclasses.dataclass
class CallbackFilter(Filter):
    """Escape-hatch filter wrapping an arbitrary differentiable callable
    (reference: PythonFilter, TopologyOptimizationFilter.hh:81-103 — the
    reference needs explicit apply/backprop callbacks; here any JAX-
    traceable function gets its adjoint from AD automatically)."""

    fn: Callable = None

    def apply(self, x):
        return self.fn(x)


# ---------------------------------------------------------------------------
# Training-side filters (torch `filtering.py` parity)
# ---------------------------------------------------------------------------

def projection_filter(x, beta, normalized=False):
    """Tanh binarizer centered at 0 (reference: filtering.py:15-22)."""
    if normalized:
        return 0.5 * (jnp.tanh(0.5 * beta) + jnp.tanh(beta * x)) / jnp.tanh(0.5 * beta)
    return 0.5 * jnp.tanh(beta * x) + 0.5


def _reflect_pad(x, pad: int, axis: int):
    return jnp.pad(
        x, [(pad, pad) if a == axis else (0, 0) for a in range(x.ndim)], mode="reflect"
    )


def _conv1d_along(x, kernel: jnp.ndarray, axis: int):
    """'Same' correlation with reflect padding along one axis."""
    k = kernel.shape[0]
    pad = k // 2
    xp = _reflect_pad(x, pad, axis)
    out = jnp.zeros_like(x)
    for i in range(k):
        sl = tuple(
            slice(i, i + x.shape[a]) if a == axis else slice(None)
            for a in range(x.ndim)
        )
        out = out + kernel[i] * xp[sl]
    return out


def smoothing_filter(x, radius: int):
    """Normalized box blur, reflect padding (reference: filtering.py:25-27,
    kornia.box_blur semantics). Works in 2-D and 3-D (separable)."""
    radius = int(round(radius))
    if radius <= 0:
        return x
    k = 2 * radius + 1
    kern = jnp.full((k,), 1.0 / k, dtype=x.dtype)
    for axis in range(x.ndim):
        x = _conv1d_along(x, kern, axis)
    return x


def gaussian_kernel_1d(kernel_size: int, sigma: float, dtype=jnp.float64):
    """Kornia-compatible normalized Gaussian window."""
    xs = jnp.arange(kernel_size, dtype=dtype) - kernel_size // 2
    g = jnp.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    return g / g.sum()


def gaussian_kernel_size(sigma: float) -> int:
    """k = floor(6 sigma), forced odd (reference: filtering.py:30-34)."""
    k = int(np.floor(6 * sigma))
    if k % 2 == 0:
        k -= 1
    return max(k, 1)


def gaussian_filter(x, sigma: float, kernel_size: Optional[int] = None):
    """Gaussian blur with reflect padding (reference: filtering.py:30-36)."""
    k = kernel_size or gaussian_kernel_size(sigma)
    kern = gaussian_kernel_1d(k, sigma, dtype=x.dtype)
    for axis in range(x.ndim):
        x = _conv1d_along(x, kern, axis)
    return x


# ---------------------------------------------------------------------------
# Adaptive-filtering schedule (reference: filtering.py:120-199)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class AdaptiveFilterState:
    """Mutable training-side filter parameters with update schedules.

    Mirrors the (ProjectionFilter, SmoothingFilter, GaussianSmoothingFilter)
    triple + config dict of the reference training drivers
    (reference: train_xdg.py:71-122, filtering.py:120-199).
    """

    use_projection: bool = False
    beta: float = 1.0
    beta_interval: float = 0.1
    beta_scaler: float = -1.0

    use_smoothing: bool = False
    radius: float = 1.0
    radius_interval: float = 0.1
    radius_scaler: float = -1.0

    use_gaussian: bool = False
    sigma: float = 1.0
    sigma_interval: float = 0.1
    sigma_scaler: float = -1.0

    def apply(self, x, beta=None, radius=None, sigma=None, kernel_size=None):
        """Apply the enabled filters (projection -> smoothing -> gaussian,
        the reference's apply_filters_group order, filtering.py:120-143).

        β/σ may be passed as dynamic (traced) scalars so a jitted training
        step can take the adaptive schedule as an operand instead of
        recompiling; radius and the Gaussian kernel size are structural
        (stencil sizes) and must be Python ints."""
        if self.use_projection:
            x = projection_filter(x, self.beta if beta is None else beta,
                                  normalized=True)
        if self.use_smoothing:
            x = smoothing_filter(x, int(self.radius if radius is None else radius))
        if self.use_gaussian:
            s = self.sigma if sigma is None else sigma
            if kernel_size is None:
                # the stencil size is structural: it can only be derived
                # from a concrete sigma. A traced sigma without an explicit
                # kernel_size would silently size the stencil from the
                # stale self.sigma — require the caller to pair them
                # (dynamic_params() does).
                if isinstance(s, jax.core.Tracer):
                    raise ValueError(
                        "AdaptiveFilterState.apply: a traced sigma requires "
                        "an explicit kernel_size (use dynamic_params())"
                    )
                kernel_size = gaussian_kernel_size(float(s))
            x = gaussian_filter(x, s, kernel_size=kernel_size)
        return x

    def dynamic_params(self, dtype=None):
        """((beta, sigma) dynamic scalars, (radius, kernel_size) static ints)."""
        dtype = dtype or jnp.float32
        return (
            (jnp.asarray(self.beta, dtype), jnp.asarray(self.sigma, dtype)),
            (int(self.radius), gaussian_kernel_size(float(self.sigma))),
        )

    def update(self, iteration: int):
        """Multiply parameters by their scalers every `interval` iterations."""
        if iteration == 0:
            return
        if self.use_projection and self.beta_interval >= 1 and iteration % int(self.beta_interval) == 0:
            self.beta *= self.beta_scaler
        if self.use_smoothing and self.radius_interval >= 1 and iteration % int(self.radius_interval) == 0:
            self.radius *= self.radius_scaler
        if self.use_gaussian and self.sigma_interval >= 1 and iteration % int(self.sigma_interval) == 0:
            self.sigma *= self.sigma_scaler

    def reset(self, beta=1.0, radius=1.0, sigma=1.0):
        self.beta, self.radius, self.sigma = beta, radius, sigma
