"""Volume constraint and constraint-satisfaction operators.

Reproduces the reference's hard and soft volume-constraint machinery
(reference: fem.py:137-333):

  * :func:`total_volume_constraint` — c = 1 - mean(rho)/v_max
    (reference: TopologyOptimizationConstraint.hh:25-31).
  * :func:`find_root` — bisection root-find for the shift b such that
    mean(projection(x + b)) == target, with an implicit-function-theorem
    custom VJP (reference: fem.py FindRootFunction:137-188).
  * :func:`sigmoid_with_constrained_mean` / hard satisfiers.
  * soft penalty modes (add_mean / one_sided_max / maxed_barrier /
    thresholded_barrier) with the loss-ratio scaler.

Everything is jittable; the bisection runs as a ``lax.while_loop``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def total_volume_constraint(rho: jnp.ndarray, max_volume: float) -> jnp.ndarray:
    """c = 1 - mean(rho) / v_max  (>= 0 feasible, 0 when active)."""
    return 1.0 - jnp.mean(rho) / max_volume


def total_volume_constraint_grad(rho: jnp.ndarray, max_volume: float) -> jnp.ndarray:
    """Constant gradient -1/(v_max * N_e)."""
    return jnp.full_like(rho, -1.0 / (max_volume * rho.size))


def logit(p):
    p = jnp.clip(p, 0.0, 1.0)
    return jnp.log(p) - jnp.log1p(-p)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def find_root(x: jnp.ndarray, target, projection: Callable):
    """Solve mean(projection(x + b)) == target for the scalar shift b.

    Monotone bisection (projection must be elementwise increasing), with
    gradient d b/d x from the implicit function theorem:
        db/dx = -(∂f/∂x) / (∂f/∂b),  f(x, b) = mean(proj(x+b)) - target.

    (reference: fem.py:137-188 FindRootFunction — tolerance 1e-12, 128
     max iterations, initial bracket [logit(t)-max(x), logit(t)-min(x)])
    """
    return _find_root_fwd(x, target, projection)[0]


def _bisect(x, target, projection):
    lo = logit(target) - jnp.max(x)
    hi = logit(target) - jnp.min(x)

    def cond(state):
        lo, hi, it = state
        return (it < 128) & (hi - lo >= 1e-12)

    def body(state):
        lo, hi, it = state
        mid = 0.5 * (lo + hi)
        f = jnp.mean(projection(x + mid)) - target
        lo = jnp.where(f > 0, lo, mid)
        hi = jnp.where(f > 0, mid, hi)
        return lo, hi, it + 1

    lo, hi, _ = jax.lax.while_loop(cond, body, (lo, hi, jnp.asarray(0, jnp.int32)))
    return 0.5 * (lo + hi)


def _find_root_fwd(x, target, projection):
    b = _bisect(x, target, projection)

    def f(xx, bb):
        return jnp.mean(projection(xx + bb)) - target

    dfdx = jax.grad(f, argnums=0)(x, b)
    dfdb = jax.grad(f, argnums=1)(x, b)
    return b, (dfdx, dfdb)


def _find_root_bwd(projection, res, g):
    dfdx, dfdb = res
    return (-dfdx / dfdb * g, None)


find_root.defvjp(_find_root_fwd, _find_root_bwd)


def sigmoid_with_constrained_mean(x, target, projection=jax.nn.sigmoid):
    """Project x through `projection` with the mean constrained to target.

    (reference: fem.py:203-224 — "Google method" from
     neural-structural-optimization)
    """
    b = find_root(x, target, projection)
    return projection(x + b)


def projection_filter_with_constrained_mean(x, target, beta=1.0):
    """Same, but through the unnormalized tanh projection filter.

    (reference: fem.py:227-247 with filtering.ProjectionFilter(beta,
     normalized=False): 0.5 tanh(beta x) + 0.5)
    """
    proj = lambda v: 0.5 * jnp.tanh(beta * v) + 0.5
    b = find_root(x, target, proj)
    return proj(x + b)


def compute_volume_loss_scaler(compliance_loss, volume_loss, mode="clip", constant=500.0):
    """Weight for the soft volume penalty (reference: fem.py:336-360)."""
    scaler = jax.lax.stop_gradient(compliance_loss / volume_loss)
    if mode == "clip":
        return jnp.minimum(scaler, constant)
    if mode == "equalize":
        return scaler
    raise ValueError(f"unknown scaler mode {mode!r}")


def satisfy_volume_constraint(
    density,
    max_volume,
    compliance_loss=None,
    mode="constrained_sigmoid",
    scaler_mode="clip",
    constant=500.0,
    beta=1.0,
):
    """Hard modes return the constrained density field; soft modes return a
    scalar penalty term to add to the loss (reference: fem.py:256-333)."""
    current = jnp.mean(density)

    if mode == "constrained_sigmoid":
        return sigmoid_with_constrained_mean(density, max_volume)
    if mode == "constrained_projection":
        return projection_filter_with_constrained_mean(density, max_volume, beta=beta)

    if mode == "add_mean":
        vloss = jnp.abs(current - max_volume)
    elif mode == "one_sided_max":
        vloss = jnp.maximum(current - max_volume, 0.0) ** 2
    elif mode == "maxed_barrier":
        eps = 1e-7
        vloss = jnp.maximum(-jnp.log(1.0 + max_volume + eps - current), 0.0)
    elif mode == "thresholded_barrier":
        eps = 1e-7
        a = jnp.where(current <= max_volume, 1.0 + max_volume + eps - current, 1.0)
        vloss = jnp.log(a / (1.0 + max_volume + eps - current)) ** 2
    else:
        raise ValueError(f"unknown volume constraint mode {mode!r}")

    scaler = compute_volume_loss_scaler(compliance_loss, vloss, scaler_mode, constant)
    return vloss * scaler


def is_hard_mode(mode: str) -> bool:
    """(reference: fem.py:363-373 type_of_volume_constaint_satisfier)"""
    hard = {"constrained_sigmoid": True, "constrained_projection": True,
            "add_mean": False, "one_sided_max": False,
            "maxed_barrier": False, "thresholded_barrier": False}
    if mode not in hard:
        raise ValueError(f'The mode "{mode}" does not exist')
    return hard[mode]
