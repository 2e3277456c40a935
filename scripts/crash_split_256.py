"""E5: split-structure (block-mode) lagged preconditioner at the
256-class — the mitigation candidate for the 2026-08-20/21 axon fault.

The fused program [build_precond -> scan(oc_step(precond=leaves))] in a
single dispatch kills the TPU worker deterministically (see
scripts/crash_bisect_256.py, ROUND5.md §3), while each component runs
clean standalone. This script executes the SAME math as a host loop of
two dispatches per block:

    leaves = jit(build_precond)(physical_density(x))   # dispatch 1
    state  = jit(scan_of_lag oc_step(precond=leaves))  # dispatch 2

and times steady-state s/step over `--reps` blocks. If this survives,
bench.py / train_voxelfem get a `block` lag mode (default while the
fused mode faults) at ~1-2 extra dispatch latencies per `lag` steps.

Usage: python scripts/crash_split_256.py [--dims 256,128,128 --mgl 5]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from ndr_tpu.utils.jax_setup import setup
setup()

import jax
import jax.numpy as jnp

from ndr_tpu.fem import multigrid as mg
from ndr_tpu.fem import topopt
from ndr_tpu.fem.simulator import problem_from_config
from ndr_tpu.io.problem import load_problem
from ndr_tpu.ops import filters as flt


def _readback(x):
    import numpy as np
    return float(np.asarray(jax.device_get(jnp.ravel(x)[-1:])))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dims", default="256,128,128")
    p.add_argument("--mgl", type=int, default=5)
    p.add_argument("--lag", type=int, default=8)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args()
    dims = tuple(int(d) for d in args.dims.split(","))

    import bench

    cfg = load_problem("problems/3d/cantilever_flexion.json")
    prob, grid = problem_from_config(cfg, dims=dims, dtype=jnp.float32)
    settings = mg.MGSolverSettings(
        num_levels=args.mgl, cg_iter=100, tol=1e-4, mg_iterations=1,
        mg_smoothing_iterations=2, full_multigrid=True,
        smoother="chebyshev", use_pallas="auto", **bench.BEST_256_SETTINGS)
    solve = mg.make_mg_solver(prob, settings)
    top = topopt.TopologyOptimizationProblem(
        prob=prob,
        filters=[flt.SmoothingFilter(radius=1), flt.ProjectionFilter(beta=1.0)],
        max_volume=cfg.max_volume, solve=solve)
    state = topopt.oc_init(top, jnp.full(grid.dims, cfg.max_volume,
                                         prob.force.dtype))

    # one plain step first: promotes state.u to the f64 accumulator dtype
    # (scan carries must be dtype-stable) and matches the bench warm
    # protocol
    step = jax.jit(lambda s: topopt.oc_step(top, s))
    t0 = time.time()
    state, _m = step(state)
    _readback(_m["compliance"])
    print(f"plain step OK (cold {time.time()-t0:.0f}s)", flush=True)

    build_pc = jax.jit(lambda x: solve.build_precond(top.physical_density(x)))

    @jax.jit
    def scan_lag(s, leaves):
        def body(s, _):
            s, m = topopt.oc_step(top, s, precond=leaves)
            return s, (m["compliance"], m["cg_iters"])
        return jax.lax.scan(body, s, None, length=args.lag)

    t0 = time.time()
    leaves = build_pc(state.x)
    _readback(leaves[0] if isinstance(leaves, (list, tuple)) else
              jax.tree_util.tree_leaves(leaves)[0])
    print(f"build_pc dispatch OK (cold {time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    state, (cs, its) = scan_lag(state, leaves)
    c = _readback(cs)
    print(f"scan_lag dispatch OK (cold {time.time()-t0:.0f}s, "
          f"c={2*c:.2f})", flush=True)

    # steady-state block loop: rebuild leaves each block, like lag mode
    t0 = time.perf_counter()
    for _ in range(args.reps):
        leaves = build_pc(state.x)
        state, (cs, its) = scan_lag(state, leaves)
    c = _readback(cs)
    sec = (time.perf_counter() - t0) / (args.reps * args.lag)
    import numpy as np
    print(f"SPLIT OK {sec*1e3:.1f} ms/step (lag {args.lag}, "
          f"reps {args.reps}, cg last {int(np.asarray(its)[-1])}, "
          f"c={2*c:.2f})", flush=True)


if __name__ == "__main__":
    main()
