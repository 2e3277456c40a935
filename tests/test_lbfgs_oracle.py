"""Oracle validation of the L-BFGS (IPOPT-replacement) optimizer path.

The reference's second optimizer is IPOPT's limited-memory quasi-Newton
mode on {box bounds, filtered-volume inequality} (fem.py:89-95 +
ipopt_helpers.py:17-101).  Our replacement (ndr_tpu.ops.lbfgs, an
augmented-Lagrangian box-projected L-BFGS) is validated here against
scipy SLSQP solving the IDENTICAL NLP:

  * on a CONVEX instance (SIMP gamma=1, linear smoothing filter only —
    compliance is operator-convex in the linear modulus, so the optimum
    is unique) the two solvers must agree tightly;
  * on the production-like nonconvex instance (gamma=3, tanh projection
    filter) local basins may differ, so only a loose bound + exact
    feasibility are asserted.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import scipy.optimize

from ndr_tpu.fem import topopt
from ndr_tpu.fem.simulator import problem_from_config
from ndr_tpu.io.problem import load_problem
from ndr_tpu.ops import filters as flt
from ndr_tpu.ops import lbfgs


def _make_top(dims, filters, gamma=None):
    cfg = load_problem("problems/2d/mbb_beam.json")
    prob, grid = problem_from_config(cfg, dims=dims)
    if gamma is not None:
        prob = dataclasses.replace(prob, gamma=gamma)

    def solve(rho, u0):
        return topopt.solve_displacement_cg(
            prob, rho, u0, tol=1e-12, max_iter=4000)

    top = topopt.TopologyOptimizationProblem(
        prob=prob, filters=list(filters), max_volume=cfg.max_volume,
        solve=solve)
    return top, cfg


def _slsqp_oracle(top, cfg, maxiter=60):
    """scipy SLSQP on the identical objective/gradient/bounds/constraint."""
    dims = top.prob.grid.dims
    n = int(np.prod(dims))
    u_carry = {"u": jnp.zeros_like(top.prob.force)}
    obj_grad = jax.jit(lambda x, u: (
        lambda c, u_new, iters: (c, top.objective_gradient(x, u_new), u_new)
    )(*top.objective(x, u)))
    vol_and_grad = jax.jit(jax.value_and_grad(
        lambda v: jnp.mean(top.physical_density(v))))

    def fun(x):
        c, g, u_new = obj_grad(jnp.asarray(x.reshape(dims)), u_carry["u"])
        u_carry["u"] = u_new
        return 2.0 * float(c), 2.0 * np.asarray(g).ravel()

    def con(x):
        v, _ = vol_and_grad(jnp.asarray(x.reshape(dims)))
        return cfg.max_volume - float(v)

    def con_jac(x):
        _, g = vol_and_grad(jnp.asarray(x.reshape(dims)))
        return -np.asarray(g).ravel()

    res = scipy.optimize.minimize(
        fun, np.full(n, cfg.max_volume), jac=True, method="SLSQP",
        bounds=[(0.0, 1.0)] * n,
        constraints=[{"type": "ineq", "fun": con, "jac": con_jac}],
        options={"maxiter": maxiter, "ftol": 1e-9},
    )
    return float(res.fun)


def test_lbfgs_matches_slsqp_on_convex_instance():
    """gamma=1 + linear filter: unique optimum — tight agreement."""
    top, cfg = _make_top((16, 8), (flt.SmoothingFilter(radius=1),),
                         gamma=1.0)
    oracle = _slsqp_oracle(top, cfg)
    res = lbfgs.lbfgs_topopt(top, jnp.full(top.prob.grid.dims,
                                           cfg.max_volume),
                             max_iter=80, log=lambda s: None)
    ours = res.history[-1]
    assert ours <= oracle * 1.02, (ours, oracle)
    rho = top.physical_density(jnp.asarray(res.x))
    assert float(jnp.mean(rho)) <= cfg.max_volume + 1e-4


def test_lbfgs_reasonable_on_nonconvex_instance():
    """Production-like gamma=3 + projection filter: basins may differ;
    assert feasibility and a bounded gap to the oracle."""
    top, cfg = _make_top(
        (16, 8),
        (flt.SmoothingFilter(radius=1), flt.ProjectionFilter(beta=1.0)))
    oracle = _slsqp_oracle(top, cfg)
    res = lbfgs.lbfgs_topopt(top, jnp.full(top.prob.grid.dims,
                                           cfg.max_volume),
                             max_iter=80, log=lambda s: None)
    ours = res.history[-1]
    assert ours <= oracle * 1.15, (ours, oracle)
    rho = top.physical_density(jnp.asarray(res.x))
    assert float(jnp.mean(rho)) <= cfg.max_volume + 1e-4
