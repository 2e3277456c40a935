"""Headline benchmark: classic SIMP OC iteration rate on 2D MBB 300x100.

Mirrors the reference's flagship logged run (logs/slurm/gt/2dMbb300x100.log:
1500 OC iterations in 241.3s => ~0.16 s/iter on a 128-core CPU node;
BASELINE.md row 1-2). Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where value is seconds per OC iteration (lower is better) and vs_baseline
is the speedup factor over the reference's 0.1609 s/iter.
"""

import json
import sys
import time


BASELINE_SEC_PER_ITER = 241.288 / 1500.0  # reference wall-clock / OC iters


def main():
    import jax
    import jax.numpy as jnp

    from ndr_tpu.utils.jax_setup import setup
    setup()

    from ndr_tpu.fem import multigrid as mg
    from ndr_tpu.fem import topopt
    from ndr_tpu.fem.simulator import problem_from_config
    from ndr_tpu.io.problem import load_problem
    from ndr_tpu.ops import filters as flt

    cfg = load_problem("problems/2d/mbb_beam.json")
    prob, grid = problem_from_config(cfg, dtype=jnp.float32)
    settings = mg.MGSolverSettings(
        num_levels=2, cg_iter=100, tol=1e-4,
        mg_iterations=1, mg_smoothing_iterations=2, full_multigrid=True,
        smoother="chebyshev", cheb_degree=2,
    )
    solve = mg.make_mg_solver(prob, settings)
    top = topopt.TopologyOptimizationProblem(
        prob=prob,
        filters=[flt.SmoothingFilter(radius=1), flt.ProjectionFilter(beta=1.0)],
        max_volume=cfg.max_volume,
        solve=solve,
    )
    state = topopt.oc_init(top, jnp.full(grid.dims, cfg.max_volume, prob.force.dtype))
    step = jax.jit(lambda s: topopt.oc_step(top, s))

    # warm up (compile) + a few steps to reach steady-state CG counts
    state, metrics = step(state)
    jax.block_until_ready(state.x)
    for _ in range(10):
        state, metrics = step(state)
    jax.block_until_ready(state.x)

    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state)
    jax.block_until_ready(state.x)
    sec_per_iter = (time.perf_counter() - t0) / n

    compliance = 2.0 * float(metrics["compliance"])
    result = {
        "metric": "2D MBB 300x100 SIMP-OC optimization (MGPCG tol=1e-4), seconds per OC iteration",
        "value": round(sec_per_iter, 6),
        "unit": "s/iter",
        "vs_baseline": round(BASELINE_SEC_PER_ITER / sec_per_iter, 3),
        "extra": {
            "baseline_s_per_iter": round(BASELINE_SEC_PER_ITER, 4),
            "compliance_at_measurement": round(compliance, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
