"""Mixed-precision iterative refinement accuracy tests.

The TO equilibrium systems are too ill-conditioned for pure fp32: (a) the
fp32 matvec's rounding noise exceeds the 1e-4 force-residual target, and
(b) rounding K0 itself to fp32 perturbs away the element rigid-body null
space, which smooth modes amplify ~1e5x into percent-level compliance
errors. The float64-refined solve must recover float64-oracle compliance.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ndr_tpu.fem import multigrid as mg
from ndr_tpu.fem import solvers
from ndr_tpu.fem.simulator import problem_from_config
from ndr_tpu.io.problem import load_problem


def test_k0_kept_in_float64():
    cfg = load_problem("problems/2d/mbb_beam.json")
    prob32, _ = problem_from_config(cfg, dims=(8, 4), dtype=jnp.float32)
    assert prob32.K0.dtype == jnp.float64
    assert prob32.force.dtype == jnp.float32


def test_refined_solve_matches_f64_oracle():
    cfg = load_problem("problems/2d/mbb_beam.json")
    dims = (32, 16)
    prob64, grid = problem_from_config(cfg, dims=dims, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    rho64 = jnp.asarray(np.round(rng.uniform(0.1, 1.0, size=grid.dims), 4))
    u_oracle = solvers.dense_solve(
        prob64.young(rho64), prob64.K0, prob64.dirichlet_mask, prob64.force, grid
    )
    c_oracle = float(jnp.vdot(prob64.force, u_oracle))

    prob32, _ = problem_from_config(cfg, dims=dims, dtype=jnp.float32)
    rho32 = rho64.astype(jnp.float32)

    st_plain = mg.MGSolverSettings(num_levels=1, cg_iter=200, tol=1e-6,
                                   mixed_precision=False)
    u_p, _ = mg.make_mg_solver(prob32, st_plain)(rho32, None)
    err_plain = abs(float(jnp.vdot(prob32.force.astype(u_p.dtype), u_p)) - c_oracle) / c_oracle

    st_mixed = mg.MGSolverSettings(num_levels=1, cg_iter=200, tol=1e-6,
                                   mixed_precision=True)
    u_m, _ = mg.make_mg_solver(prob32, st_mixed)(rho32, None)
    assert u_m.dtype == jnp.float64
    err_mixed = abs(float(jnp.vdot(prob32.force.astype(jnp.float64), u_m)) - c_oracle) / c_oracle

    # note: rho32 cast shifts the operator by ~1e-8 relative; the refined
    # compliance must land within ~1e-5 of the oracle, orders of
    # magnitude closer than the stalled pure-fp32 solve
    assert err_mixed < 3e-5, err_mixed
    assert err_mixed < err_plain / 10, (err_mixed, err_plain)


def test_refined_solve_chebyshev_smoother():
    cfg = load_problem("problems/3d/cantilever_flexion.json")
    dims = (8, 4, 4)
    prob64, grid = problem_from_config(cfg, dims=dims, dtype=jnp.float64)
    rho64 = jnp.full(grid.dims, 0.5)
    u_oracle = solvers.dense_solve(
        prob64.young(rho64), prob64.K0, prob64.dirichlet_mask, prob64.force, grid
    )
    c_oracle = float(jnp.vdot(prob64.force, u_oracle))

    prob32, _ = problem_from_config(cfg, dims=dims, dtype=jnp.float32)
    st = mg.MGSolverSettings(num_levels=1, cg_iter=200, tol=1e-7,
                             mixed_precision=True, smoother="chebyshev")
    u, _ = mg.make_mg_solver(prob32, st)(rho64.astype(jnp.float32), None)
    c = float(jnp.vdot(prob32.force.astype(jnp.float64), u))
    assert abs(c - c_oracle) / c_oracle < 1e-5
