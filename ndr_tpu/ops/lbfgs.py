"""Bound-constrained L-BFGS driver for classic SIMP (IPOPT replacement).

The reference's second optimizer path wraps the TO problem in cyipopt and
runs IPOPT's limited-memory quasi-Newton mode (fem.py:89-95 'LBFGS' +
ipopt_helpers.initializeIpoptProblem: box bounds [0,1] on densities, one
volume inequality constraint). Here the same problem is solved TPU-side
with a projected two-metric scheme:

  * L-BFGS curvature pairs build the search direction (optax.scale_by_lbfgs
    style two-loop recursion, implemented explicitly so we can project);
  * box bounds handled by clipping + gradient projection on the active set;
  * the volume constraint enforced exactly after every step by the same
    bisection projection used by the hard volume satisfiers
    (mean(clip(x + b)) = v_max), which keeps iterates feasible like
    IPOPT's restoration does.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from ndr_tpu.fem import topopt as topo
from ndr_tpu.ops import volume as vol


def project_feasible(x, max_volume):
    """Project onto {0 <= x <= 1, mean(x) <= v_max} (active at optimum):
    clip(x + b) with the shift b found by monotone bisection."""
    def proj(v):
        return jnp.clip(v, 0.0, 1.0)

    # bisection on the shift so the clipped mean hits max_volume; the
    # bracket must cover arbitrarily large pre-projection values
    def f(b):
        return jnp.mean(proj(x + b)) - max_volume

    lo = -jnp.max(x)            # clip(x+lo) == 0 somewhere, mean < vmax
    hi = 1.0 - jnp.min(x)       # clip(x+hi) == 1 everywhere, mean > vmax

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        pos = f(mid) > 0
        return jnp.where(pos, lo, mid), jnp.where(pos, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 80, body, (lo, hi))
    b = 0.5 * (lo + hi)
    # only project *down* when infeasible (inequality constraint)
    b = jnp.minimum(b, 0.0)
    return proj(x + b)


@dataclasses.dataclass
class LBFGSResult:
    x: np.ndarray
    history: List[float]


def lbfgs_topopt(
    top: topo.TopologyOptimizationProblem,
    x0: jnp.ndarray,
    max_iter: int = 100,
    memory: int = 10,
    step_size: float = 0.05,
    log: Callable[[str], None] = lambda s: sys.stderr.write(s),
    log_every: int = 10,
) -> LBFGSResult:
    """Projected L-BFGS on compliance with exact volume projection."""
    m = memory
    x = project_feasible(x0, top.max_volume)
    u = jnp.zeros_like(top.prob.force)

    @jax.jit
    def eval_obj_grad(x, u):
        c, u_new, iters = top.objective(x, u)
        g = top.objective_gradient(x, u_new)
        return c, g, u_new

    @jax.jit
    def lbfgs_step(x, g, s_hist, y_hist, rho_hist, n_pairs):
        """Two-loop recursion over the ring-buffered curvature pairs."""
        q = g
        alphas = jnp.zeros((m,), x.dtype)

        def bwd(i, carry):
            q, alphas = carry
            idx = (n_pairs - 1 - i) % m
            valid = i < n_pairs
            a = rho_hist[idx] * jnp.vdot(s_hist[idx], q)
            a = jnp.where(valid, a, 0.0)
            q = q - a * y_hist[idx]
            return q, alphas.at[idx].set(a)

        q, alphas = jax.lax.fori_loop(0, m, bwd, (q, alphas))

        # initial Hessian scaling gamma = s.y / y.y of most recent pair
        idx_last = (n_pairs - 1) % m
        sy = jnp.vdot(s_hist[idx_last], y_hist[idx_last])
        yy = jnp.vdot(y_hist[idx_last], y_hist[idx_last])
        gamma = jnp.where(n_pairs > 0, sy / jnp.maximum(yy, 1e-30), 1.0)
        r = gamma * q

        def fwd(i, r):
            idx = i % m
            valid = i >= (n_pairs - m).clip(0)
            valid = valid & (i < n_pairs)
            b = rho_hist[idx] * jnp.vdot(y_hist[idx], r)
            corr = (alphas[idx] - b) * s_hist[idx]
            return r + jnp.where(valid, 1.0, 0.0) * corr

        r = jax.lax.fori_loop(0, m, fwd, r)
        return r  # approximate H^{-1} g

    shape = x.shape
    s_hist = jnp.zeros((m,) + shape, x.dtype)
    y_hist = jnp.zeros((m,) + shape, x.dtype)
    rho_hist = jnp.zeros((m,), x.dtype)
    n_pairs = jnp.asarray(0, jnp.int32)

    history: List[float] = []
    c, g, u = eval_obj_grad(x, u)
    for it in range(max_iter):
        d = lbfgs_step(x, g, s_hist, y_hist, rho_hist, n_pairs)
        if float(jnp.vdot(g, d)) <= 0.0:
            d = g  # quasi-Newton direction lost descent; steepest descent
        # backtracking line search on the projected path (projected quasi-
        # Newton steps can be ascent directions when the projection is
        # active; IPOPT's filter line search plays the same role)
        alpha = step_size
        accepted = False
        for _ in range(12):
            x_new = project_feasible(x - alpha * d, top.max_volume)
            c_new, g_new, u_try = eval_obj_grad(x_new, u)
            if float(c_new) <= float(c):
                accepted = True
                break
            alpha *= 0.4
        if not accepted:
            # no decrease along this direction: reset curvature memory
            s_hist = jnp.zeros_like(s_hist)
            y_hist = jnp.zeros_like(y_hist)
            rho_hist = jnp.zeros_like(rho_hist)
            n_pairs = jnp.asarray(0, jnp.int32)
            history.append(2.0 * float(c))
            continue
        u = u_try

        # curvature pair on the projected step
        s = x_new - x
        yv = g_new - g
        sy = float(jnp.vdot(s, yv))
        if sy > 1e-12:
            idx = int(n_pairs) % m
            s_hist = s_hist.at[idx].set(s)
            y_hist = y_hist.at[idx].set(yv)
            rho_hist = rho_hist.at[idx].set(1.0 / sy)
            n_pairs = n_pairs + 1
        x, g, c = x_new, g_new, c_new
        history.append(2.0 * float(c))
        if it % log_every == 0 or it == max_iter - 1:
            log(f"LBFGS iter {it}: compliance {2.0 * float(c):.6f}, "
                f"vol {float(jnp.mean(top.physical_density(x))):.4f}\n")
    return LBFGSResult(x=np.asarray(x), history=history)
