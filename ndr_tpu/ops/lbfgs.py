"""Bound-constrained L-BFGS driver for classic SIMP (IPOPT replacement).

The reference's second optimizer path wraps the TO problem in cyipopt and
runs IPOPT's limited-memory quasi-Newton mode (fem.py:89-95 'LBFGS' +
ipopt_helpers.initializeIpoptProblem: box bounds [0,1] on densities, one
volume inequality constraint on the FILTERED density). Here the same
problem is solved TPU-side with an augmented-Lagrangian scheme:

  * outer loop: classic AL multiplier updates for the scalar volume
    inequality g(x) = mean(physical(x)) - v_max
    (lambda <- max(0, lambda + mu g); mu grown when g stalls) — the same
    role IPOPT's barrier/multiplier machinery plays;
  * inner loop: box-projected L-BFGS (two-loop recursion, clip-to-[0,1]
    projection, Armijo backtracking from the natural step 1) on the AL
    objective  c(x) + mu/2 max(0, lambda/mu + g)^2 - lambda^2/(2 mu);
  * a final exact feasibility restoration (monotone bisection on a
    uniform shift, like the reference's OC bisection which re-filters
    each iterate, OptimalityCriterion.hh:51-69).

Validated against a scipy SLSQP oracle on the identical NLP
(tests/test_topopt.py::test_lbfgs_matches_scipy_slsqp_oracle).
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from ndr_tpu.fem import topopt as topo


def project_feasible(x, max_volume, density_fn=None):
    """Feasibility restoration: find the shift b so that
    ``mean(density_fn(clip(x + b))) == v_max`` by monotone bisection and
    return clip(x + b).

    With ``density_fn`` = the filter chain this enforces the constraint on
    the PHYSICAL density — the reference's volume-constraint semantics
    (TotalVolumeConstraint evaluates filtered vars; the OC bisection
    re-filters each iterate, OptimalityCriterion.hh:51-69 /
    TopologyOptimizationProblem.hh:73-85). Monotone because clip, the
    smoothing convolution and the tanh projection are all monotone."""
    if density_fn is None:
        density_fn = lambda v: v

    def proj(v):
        return jnp.clip(v, 0.0, 1.0)

    # bisection on the shift so the filtered clipped mean hits max_volume;
    # the bracket must cover arbitrarily large pre-projection values
    def f(b):
        return jnp.mean(density_fn(proj(x + b))) - max_volume

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
    outer_iters: int = 6,
    ctol: float = 1e-4,
    log: Callable[[str], None] = lambda s: sys.stderr.write(s),
    log_every: int = 10,
) -> LBFGSResult:
    """Augmented-Lagrangian L-BFGS on compliance with box bounds and the
    filtered-volume inequality. `max_iter` bounds the TOTAL number of
    inner L-BFGS iterations across all outer multiplier updates."""
    m = memory
    project = jax.jit(
        lambda v: project_feasible(v, top.max_volume, top.physical_density)
    )
    clip = jax.jit(lambda v: jnp.clip(v, 0.0, 1.0))
    x = clip(x0)
    u = jnp.zeros_like(top.prob.force)

    @jax.jit
    def eval_core(x, u):
        """One objective+gradient evaluation: compliance via the adjoint,
        volume gap + its gradient via AD through the filter chain. The
        single CG-containing jit in this driver (compiled once)."""
        c, u_new, iters = top.objective(x, u)
        gc = top.objective_gradient(x, u_new)

        def volume_gap(v):
            return jnp.mean(top.physical_density(v)) - top.max_volume

        g, gv = jax.value_and_grad(volume_gap)(x)
        return c, gc, g, gv, u_new

    def eval_al(x, u, lam, mu):
        """AL objective + gradient (cheap combination outside jit)."""
        c, gc, g, gv, u_new = eval_core(x, u)
        t = max(0.0, lam + mu * float(g))
        phi = float(c) + (t * t - lam * lam) / (2.0 * mu)
        gphi = gc + t * gv
        return phi, gphi, c, g, u_new

    @jax.jit
    def lbfgs_step(g, s_hist, y_hist, rho_hist, n_pairs):
        """Two-loop recursion over the ring-buffered curvature pairs."""
        q = g
        alphas = jnp.zeros((m,), g.dtype)

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

    def reset_memory():
        return (jnp.zeros((m,) + shape, x.dtype),
                jnp.zeros((m,) + shape, x.dtype),
                jnp.zeros((m,), x.dtype),
                jnp.asarray(0, jnp.int32))

    history: List[float] = []
    # warm multiplier: the constraint is active at the optimum, so starting
    # the AL at the KKT least-squares estimate lambda = -<grad c, grad g>/
    # |grad g|^2 makes the very first inner solve minimize (approximately)
    # the right Lagrangian instead of first chasing the unconstrained
    # objective into the infeasible region
    c0, gc0, gap0, gv0, u = eval_core(x, u)
    lam = max(0.0, float(
        -jnp.vdot(gc0, gv0) / jnp.maximum(jnp.vdot(gv0, gv0), 1e-30)))
    # initial penalty: scale so a typical constraint violation costs a
    # few percent of the objective
    mu = float(10.0 * jnp.abs(c0) / jnp.maximum(jnp.abs(gap0), 1e-2))
    phi, gphi, c, gap = None, None, c0, gap0
    it_total = 0
    for outer in range(outer_iters):
        s_hist, y_hist, rho_hist, n_pairs = reset_memory()
        phi, gphi, c, gap, u = eval_al(x, u, lam, mu)
        inner_budget = max(max_iter // outer_iters, 10)
        stalls = 0
        for it in range(inner_budget):
            if it_total >= max_iter:
                break
            d = lbfgs_step(gphi, s_hist, y_hist, rho_hist, n_pairs)
            quasi_newton = float(jnp.vdot(gphi, d)) > 0.0
            if not quasi_newton:
                d = gphi
            # Armijo backtracking from the natural quasi-Newton step
            alpha = 1.0 if (quasi_newton and int(n_pairs) > 0) else step_size
            accepted = False
            for _ in range(16):
                x_new = clip(x - alpha * d)
                phi_new, gphi_new, c_new, gap_new, u_try = eval_al(
                    x_new, u, lam, mu)
                if float(phi_new) <= float(phi):
                    accepted = True
                    break
                alpha *= 0.4
            it_total += 1
            history.append(2.0 * float(c))
            if not accepted:
                s_hist, y_hist, rho_hist, n_pairs = reset_memory()
                stalls += 1
                if stalls >= 2:
                    break       # inner problem converged
                continue
            stalls = 0
            u = u_try
            s = x_new - x
            yv = gphi_new - gphi
            sy = float(jnp.vdot(s, yv))
            if sy > 1e-12:
                idx = int(n_pairs) % m
                s_hist = s_hist.at[idx].set(s)
                y_hist = y_hist.at[idx].set(yv)
                rho_hist = rho_hist.at[idx].set(1.0 / sy)
                n_pairs = n_pairs + 1
            x, phi, gphi, c, gap = x_new, phi_new, gphi_new, c_new, gap_new
            if it_total % log_every == 0:
                log(f"LBFGS outer {outer} iter {it_total}: compliance "
                    f"{2.0 * float(c):.6f}, gap {float(gap):+.2e}, "
                    f"lambda {lam:.3g}\n")
        # multiplier update; grow the penalty if still infeasible
        lam = max(0.0, lam + mu * float(gap))
        if float(gap) > ctol:
            mu *= 4.0
        if it_total >= max_iter:
            break
        if abs(float(gap)) <= ctol and lam > 0.0 and outer >= 1:
            # feasible with settled multiplier — converged
            break
    # exact feasibility restoration (active constraint at the optimum)
    x = project(x)
    c, _, _, _, u = eval_core(x, u)
    history.append(2.0 * float(c))
    log(f"LBFGS final: compliance {2.0 * float(c):.6f}, vol "
        f"{float(jnp.mean(top.physical_density(x))):.4f}\n")
    return LBFGSResult(x=np.asarray(x), history=history)
