"""Topology-optimization problem layer: objective, filters, constraints, OC.

The TPU-native analogue of the reference's L2 problem layer
(TopologyOptimizationProblem.hh, TopologyOptimizationObjective.hh,
OptimalityCriterion.hh), expressed as pure jittable functions over a
:class:`ndr_tpu.fem.simulator.FEMProblem`.

Key design choice: the compliance objective exposes its *closed-form
adjoint gradient* through ``jax.custom_vjp`` — the linear solve is never
differentiated through (the reference computes the same gradient in
TensorProductSimulator::complianceGradient, :730-751). Filter-chain
backprop falls out of ordinary JAX AD (reference hand-writes it in
TopologyOptimizationProblem::evaluateObjectiveGradient, :98-113).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST  # see multigrid._HIGHEST note

from ndr_tpu.fem import operators as ops
from ndr_tpu.fem import solvers
from ndr_tpu.fem.simulator import FEMProblem
from ndr_tpu.ops import volume as vol
from ndr_tpu.ops.filters import Filter, apply_filter_chain


# ---------------------------------------------------------------------------
# Linear solves
# ---------------------------------------------------------------------------

def block_jacobi_preconditioner(prob: FEMProblem, rho: jnp.ndarray):
    """Per-node NxN block-diagonal preconditioner M^-1 (plain-CG helper)."""
    young = prob.young(rho)
    blocks = ops.node_diag_blocks(young, prob.K0, prob.grid)
    inv = ops.invert_blocks(blocks)

    def apply(r):
        s = jnp.einsum("...ij,...j->...i", inv, r, precision=_HIGHEST)
        return ops.zero_dirichlet(s, prob.dirichlet_mask)

    return apply


def solve_displacement_cg(
    prob: FEMProblem,
    rho: jnp.ndarray,
    u0: Optional[jnp.ndarray] = None,
    tol: float = 1e-5,
    max_iter: int = 5000,
    preconditioned: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Equilibrium solve K(rho) u = f with (block-Jacobi) CG.

    Direct replacement for small/medium problems; the MGPCG path lives in
    :mod:`ndr_tpu.fem.multigrid`.
    """
    young = prob.young(rho)

    def apply_a(u):
        return prob.zero_dirichlet(ops.apply_k(prob.zero_dirichlet(u), young, prob.K0, prob.grid))

    b = prob.zero_dirichlet(prob.force)
    if u0 is None:
        u0 = jnp.zeros_like(b)
    u0 = prob.zero_dirichlet(u0)
    precond = block_jacobi_preconditioner(prob, rho) if preconditioned else None
    return solvers.conjugate_gradient(apply_a, b, u0, tol=tol, max_iter=max_iter, precond=precond)


# ---------------------------------------------------------------------------
# Compliance with closed-form adjoint
# ---------------------------------------------------------------------------

@jax.custom_vjp
def compliance_with_adjoint(rho: jnp.ndarray, u: jnp.ndarray, prob: FEMProblem):
    """compliance = 1/2 f^T u, with d(compliance)/d(rho) given by the
    self-adjoint closed form (u is treated as the exact equilibrium of
    K(rho) u = f; no gradient flows into u).

    `prob` is a differentiable pytree argument with zero cotangents (not
    nondiff_argnums) so drivers may pass it as a traced jit operand —
    inlining the force field as a module literal is what bloated remote
    compiles at 4M voxels.

    (reference: ComplianceObjective::compliance + TPS::complianceGradient)
    """
    return 0.5 * jnp.vdot(prob.force, u, precision=_HIGHEST)


def _compliance_fwd(rho, u, prob):
    c = 0.5 * jnp.vdot(prob.force, u, precision=_HIGHEST)
    return c, (rho, u, prob)


def _zero_cotangent(x):
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact):
        return jnp.zeros_like(x)
    import numpy as _np
    return _np.zeros(_np.shape(x), dtype=jax.dtypes.float0)


def _compliance_bwd(res, g):
    rho, u, prob = res
    # the adjoint gradient only needs the working precision of rho —
    # cast u down so the (hot) gradient einsums stay in fp32 even when
    # the mixed-precision solver hands back a float64 equilibrium
    grad = prob.compliance_gradient(u.astype(rho.dtype), rho)
    zero_prob = jax.tree_util.tree_map(_zero_cotangent, prob)
    return ((g * grad).astype(rho.dtype), jnp.zeros_like(u), zero_prob)


compliance_with_adjoint.defvjp(_compliance_fwd, _compliance_bwd)


# ---------------------------------------------------------------------------
# Topology-optimization problem (filters + constraint + objective)
# ---------------------------------------------------------------------------

SolveFn = Callable[[jnp.ndarray, Optional[jnp.ndarray]], Tuple[jnp.ndarray, jnp.ndarray]]


@dataclasses.dataclass
class TopologyOptimizationProblem:
    """Bundles simulator + filter chain + volume constraint + solver.

    (reference: TopologyOptimizationProblem.hh:18-206; here stateless —
    caller threads (x, u) through the pure functions.)
    """

    prob: FEMProblem
    filters: Sequence[Filter]
    max_volume: float
    solve: SolveFn  # (rho, u0) -> (u, iters)

    def physical_density(self, x: jnp.ndarray) -> jnp.ndarray:
        return apply_filter_chain(x, self.filters)

    def objective(self, x, u0=None, precond=None):
        """Returns (compliance, u, cg_iters). compliance = 1/2 f^T u.

        ``precond``: optional lagged-preconditioner leaves (see
        multigrid.build_precond_leaves) forwarded to the solver — only
        SolveFns from make_mg_solver accept it."""
        rho = self.physical_density(x)
        if precond is None:
            u, iters = self.solve(rho, u0)
        else:
            u, iters = self.solve(rho, u0, precond=precond)
        c = compliance_with_adjoint(rho, u, self.prob)
        return c, u, iters

    def objective_gradient(self, x, u):
        """d(compliance)/d(design x): closed-form adjoint + filter backprop."""
        def c_of_x(xx):
            rho = self.physical_density(xx)
            return compliance_with_adjoint(rho, u, self.prob)

        return jax.grad(c_of_x)(x)

    def constraint(self, x):
        rho = self.physical_density(x)
        return vol.total_volume_constraint(rho, self.max_volume)

    def constraint_gradient(self, x):
        return jax.grad(self.constraint)(x)


# ---------------------------------------------------------------------------
# Optimality-criteria optimizer
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OCState:
    """Carried OC optimizer state (design vars, warm-started u, λ bracket).

    The λ bracket persists across steps like the reference's member
    variables (OptimalityCriterion.hh:38-39, 63-69).
    """

    x: jnp.ndarray
    u: jnp.ndarray
    lambda_min: jnp.ndarray
    lambda_max: jnp.ndarray


def oc_init(top: TopologyOptimizationProblem, x0: jnp.ndarray,
            u_dtype=None) -> OCState:
    """`u_dtype` should match the solver's output dtype (float64 for the
    mixed-precision MGPCG) so the carried warm start doesn't retrace."""
    u_dtype = u_dtype or top.prob.force.dtype
    return OCState(
        x=x0,
        u=jnp.zeros(top.prob.force.shape, u_dtype),
        lambda_min=jnp.asarray(1.0, x0.dtype),
        lambda_max=jnp.asarray(2.0, x0.dtype),
    )


def oc_step(
    top: TopologyOptimizationProblem,
    state: OCState,
    m: float = 0.2,
    ctol: float = 1e-6,
    precond=None,
):
    """One Optimality-Criteria step (reference: OptimalityCriterion.hh:41-75).

    x <- clip(x * sqrt(dJ / (λ dc)), [x - m, x + m] ∩ [0, 1]) with λ found
    by bracketed bisection on the volume constraint of the *filtered*
    stepped variables.

    Returns (new_state, metrics dict).
    """
    x0 = state.x
    # solve + gradients at current design
    c, u, iters = top.objective(x0, state.u, precond=precond)
    dJ = top.objective_gradient(x0, u)
    dc = top.constraint_gradient(x0)

    def stepped_vars(lam):
        ratio = dJ / (dc * lam)
        step = x0 * jnp.sqrt(jnp.maximum(ratio, 0.0))
        return jnp.clip(step, jnp.maximum(x0 - m, 0.0), jnp.minimum(x0 + m, 1.0))

    def ceval(lam):
        return vol.total_volume_constraint(
            top.physical_density(stepped_vars(lam)), top.max_volume
        )

    lam_min, lam_max = state.lambda_min, state.lambda_max

    # expand bracket downward: while c(λmin) > 0: λmax=λmin; λmin/=2
    def down_cond(s):
        lmin, lmax = s
        return ceval(lmin) > 0

    def down_body(s):
        lmin, lmax = s
        return lmin * 0.5, lmin

    lam_min, lam_max = jax.lax.while_loop(down_cond, down_body, (lam_min, lam_max))

    # expand bracket upward: while c(λmax) < 0: λmin=λmax; λmax*=2
    def up_cond(s):
        lmin, lmax = s
        return ceval(lmax) < 0

    def up_body(s):
        lmin, lmax = s
        return lmax, lmax * 2.0

    lam_min, lam_max = jax.lax.while_loop(up_cond, up_body, (lam_min, lam_max))

    # bisection to |c| <= ctol (iteration-capped: in float32 the volume
    # mean has ~1e-7 rounding noise, and an unreachable ctol must not
    # spin the while_loop forever)
    def bis_cond(s):
        lmin, lmax, lmid, v, it = s
        return (jnp.abs(v) > ctol) & (it < 100)

    def bis_body(s):
        lmin, lmax, lmid, v, it = s
        lmin = jnp.where(v < 0, lmid, lmin)
        lmax = jnp.where(v > 0, lmid, lmax)
        lmid = 0.5 * (lmin + lmax)
        return lmin, lmax, lmid, ceval(lmid), it + 1

    lam_mid0 = 0.5 * (lam_min + lam_max)
    lam_min, lam_max, lam_mid, v, _ = jax.lax.while_loop(
        bis_cond, bis_body,
        (lam_min, lam_max, lam_mid0, ceval(lam_mid0), jnp.asarray(0, jnp.int32)),
    )

    x_new = stepped_vars(lam_mid)
    new_state = OCState(x=x_new, u=u, lambda_min=lam_min, lambda_max=lam_max)
    metrics = {
        "compliance": c,
        "constraint": v,
        "lambda": lam_mid,
        "cg_iters": iters,
    }
    return new_state, metrics
