"""Benchmark harness: classic + neural optimization throughput vs the
reference's committed Slurm-log numbers (BASELINE.md).

Sub-benchmarks (all measured steady-state, compile excluded):
  1. 2D MBB 300x100 classic SIMP-OC          (ref 241.3s/1500it = 0.1609 s/iter,
                                              logs/slurm/gt/2dMbb300x100.log)
  2. 3D cantilever_flexion 192x96x96 classic (ref extrapolated per-voxel from
     SIMP-OC, mgl=3, Pallas                   c1001.log: 2.8 s/iter at 4.19M vox
                                              -> 1.182 s/iter at 1.77M vox)
  3. neural FF-MLP TO, 3D bridge 64x32x16    (ref 1.11 it/s = 0.90 s/iter,
     (1024-FF/512x4, maxed_barrier, mgl=3)    logs/slurm/ff/test.log)

Prints ONE JSON line; `value` is the headline 3D classic s/iter (the
capability the paper scales on), `vs_baseline` its speedup; per-bench
numbers are in `extra`. Set NDR_BENCH_FULL=1 to add the exact-config
256x128x128 run (ref 2.8 s/iter) — ~20 min cold compile at 4.19M voxels.
"""

import json
import os
import sys
import time


REF_2D_S_PER_ITER = 241.288 / 1500.0          # 2dMbb300x100.log

# Solver settings for the 256-class headline, chosen by the on-device
# scan-timed variant sweep (scripts/profile_oc.py --scan, logs/
# profile_oc_256_scan.json): bound-only lambda_max + degree-2 Chebyshev
# polynomial = 384.6 ms/step vs 487.3 base (cg_iters 2, compliance
# parity at 252.526 vs 252.522).
BEST_256_SETTINGS = {"lmax_power_iters": 0, "cheb_degree": 1}
REF_3D_256_S_PER_ITER = 2.8                   # c1001.log steady average
REF_3D_192_S_PER_ITER = 2.8 / (256 * 128 * 128) * (192 * 96 * 96)  # 1.182
REF_NEURAL64_S_PER_ITER = 1.0 / 1.11          # ff/test.log


def _readback(x):
    """Timing fence. Through the axon tunnel `block_until_ready` on a
    chained jit output has been observed to return early; an actual host
    readback is the only trustworthy sync point (TODO.md methodology
    note)."""
    import jax.numpy as jnp
    return float(jnp.asarray(x).sum())


def _classic_bench(prob_path, dims, mgl, warm, n, use_pallas="auto",
                   settings_kw=None, precond_lag=0):
    import jax
    import jax.numpy as jnp

    from ndr_tpu.fem import multigrid as mg
    from ndr_tpu.fem import topopt
    from ndr_tpu.fem.simulator import problem_from_config
    from ndr_tpu.io.problem import load_problem
    from ndr_tpu.ops import filters as flt

    cfg = load_problem(prob_path)
    prob, grid = problem_from_config(cfg, dims=dims, dtype=jnp.float32)
    kw = dict(
        num_levels=mgl, cg_iter=100, tol=1e-4,
        mg_iterations=1, mg_smoothing_iterations=2, full_multigrid=True,
        smoother="chebyshev", cheb_degree=2, use_pallas=use_pallas,
    )
    kw.update(settings_kw or {})
    settings = mg.MGSolverSettings(**kw)
    solve = mg.make_mg_solver(prob, settings)
    top = topopt.TopologyOptimizationProblem(
        prob=prob,
        filters=[flt.SmoothingFilter(radius=1), flt.ProjectionFilter(beta=1.0)],
        max_volume=cfg.max_volume,
        solve=solve,
    )
    state = topopt.oc_init(top, jnp.full(grid.dims, cfg.max_volume,
                                         prob.force.dtype))
    step = jax.jit(lambda s: topopt.oc_step(top, s))

    state, metrics = step(state)
    _readback(metrics["compliance"])
    for _ in range(warm):
        state, metrics = step(state)
    _readback(metrics["compliance"])

    # Device-side loop: one dispatch runs `n` full OC steps so the
    # per-dispatch tunnel/host latency (~100 ms through axon at 4M
    # voxels, variable) amortizes away. This matches sustained driver
    # throughput — the number a production on-device OC loop delivers.
    # (named run_k with the same body as scripts/profile_oc.py's scan
    # program so the persistent compile cache is shared between them)
    if precond_lag > 1:
        # lagged preconditioner: the hierarchy + coarsest factor ride
        # the scan carry, rebuilt every `precond_lag` steps (the same
        # program shape as profile_oc.py's <base>_lagN variants)
        @jax.jit
        def run_k_lag(s, leaves):
            def body(carry, i):
                s, lv = carry
                lv = jax.lax.cond(
                    i % precond_lag == 0,
                    lambda _: solve.build_precond(top.physical_density(s.x)),
                    lambda l: l, lv)
                s, m = topopt.oc_step(top, s, precond=lv)
                return (s, lv), (m["compliance"], m["cg_iters"])
            return jax.lax.scan(body, (s, leaves), jnp.arange(n))

        leaves0 = jax.jit(solve.build_precond)(
            jax.jit(top.physical_density)(state.x))
        (state, leaves), (cs, its) = run_k_lag(state, leaves0)
        _readback(cs)
        t0 = time.perf_counter()
        (state, leaves), (cs, its) = run_k_lag(state, leaves)
        last_c = _readback(cs[-1:])
        sec = (time.perf_counter() - t0) / n
        return sec, 2.0 * last_c

    @jax.jit
    def run_k(s):
        def body(s, _):
            s, m = topopt.oc_step(top, s)
            return s, (m["compliance"], m["cg_iters"])
        return jax.lax.scan(body, s, None, length=n)

    state, (cs, its) = run_k(state)            # compile + warm the scan
    _readback(cs)
    t0 = time.perf_counter()
    state, (cs, its) = run_k(state)
    last_c = _readback(cs[-1:])
    sec = (time.perf_counter() - t0) / n
    return sec, 2.0 * last_c


def _neural_bench(warm=40, n=60):
    """Steady-state neural step rate at the reference's like-for-like
    config (the warm phase hardens the design so CG counts are realistic;
    round-1's from-init measurement overstated throughput 2.5x)."""
    import jax

    from ndr_tpu.io.problem import load_problem
    from ndr_tpu.training.neural import NeuralTOConfig, build_trainer

    cfg = load_problem("problems/3d/bridge.json")
    import dataclasses
    cfg = dataclasses.replace(cfg, max_volume=0.4)
    ncfg = NeuralTOConfig(
        embedding_size=1024, n_neurons=512, n_layers=4,
        volume_constraint_satisfier="maxed_barrier", multigrid_levels=2,
        seed=cfg.seed,
    )
    state, train_step, aux = build_trainer(cfg, ncfg, dims=(64, 32, 16))
    state, metrics = train_step(state)
    _readback(metrics["compliance"])
    for _ in range(warm):
        state, metrics = train_step(state)
    _readback(metrics["compliance"])

    @jax.jit
    def run_n(s):
        def body(s, _):
            s, m = train_step(s)
            return s, m["compliance"]
        return jax.lax.scan(body, s, None, length=n)

    state, cs = run_n(state)
    _readback(cs)
    t0 = time.perf_counter()
    state, cs = run_n(state)
    last_c = _readback(cs[-1:])
    sec = (time.perf_counter() - t0) / n
    return sec, last_c


def main():
    import jax

    from ndr_tpu.utils.jax_setup import setup
    setup()

    extra = {"device": str(jax.devices()[0])}

    s2d, c2d = _classic_bench("problems/2d/mbb_beam.json", None, 2,
                              warm=10, n=50)
    extra["classic_2d_mbb_300x100"] = {
        "s_per_iter": round(s2d, 5), "ref_s_per_iter": round(REF_2D_S_PER_ITER, 4),
        "speedup": round(REF_2D_S_PER_ITER / s2d, 2),
        "compliance_at_measurement": round(c2d, 2),
    }

    sn, cn = _neural_bench()
    extra["neural_3d_bridge_64x32x16"] = {
        "s_per_iter": round(sn, 5), "ref_s_per_iter": round(REF_NEURAL64_S_PER_ITER, 4),
        "speedup": round(REF_NEURAL64_S_PER_ITER / sn, 2),
        "compliance_at_measurement": round(cn, 2),
        "note": "steady-state after 40 hardening steps (it/s from init is ~2.5x higher)",
    }

    s3d, c3d = _classic_bench("problems/3d/cantilever_flexion.json",
                              (192, 96, 96), 3, warm=5, n=20)
    extra["classic_3d_cantilever_192x96x96"] = {
        "s_per_iter": round(s3d, 5),
        "ref_s_per_iter": round(REF_3D_192_S_PER_ITER, 4),
        "ref_basis": "per-voxel extrapolation of c1001.log (2.8 s/iter at 4.19M voxels)",
        "speedup": round(REF_3D_192_S_PER_ITER / s3d, 2),
        "compliance_at_measurement": round(c3d, 2),
    }

    # Headline: the exact-config 4.19M-voxel run of the reference's
    # c1001.log (2.8 s/iter on its 32-core production node). Apples to
    # apples — same problem JSON, same grid, mgl=5. The persistent
    # compilation cache (utils/jax_setup.py) hides the cold compile on
    # repeat runs; set NDR_BENCH_FAST=1 to skip during development.
    if not os.environ.get("NDR_BENCH_FAST"):
        # n=30 matches the profiler's scan-of-30 program shape so the
        # persistent compile cache built by scripts/profile_oc.py --scan
        # is reused (a fresh scan length would recompile ~10 min cold).
        # precond_lag=8: hierarchy + coarsest factor rebuilt every 8 OC
        # steps (the CG operator stays exact — solves land on the same
        # trajectory; tests/test_training.py pins the driver-level match).
        # NDR_BENCH_LAG=0 restores the rebuild-every-step baseline.
        lag = int(os.environ.get("NDR_BENCH_LAG", "8"))
        s256, c256 = _classic_bench(
            "problems/3d/cantilever_flexion.json", (256, 128, 128), 5,
            warm=5, n=30, settings_kw=BEST_256_SETTINGS, precond_lag=lag)
        extra["classic_3d_cantilever_256x128x128"] = {
            "s_per_iter": round(s256, 5), "ref_s_per_iter": REF_3D_256_S_PER_ITER,
            "ref_basis": "c1001.log steady state (exact config match)",
            "speedup": round(REF_3D_256_S_PER_ITER / s256, 2),
            "compliance_at_measurement": round(c256, 2),
        }
        headline_s, headline_ref = s256, REF_3D_256_S_PER_ITER
        metric = ("3D cantilever_flexion 256x128x128 classic SIMP-OC "
                  "(MGPCG mgl=5 tol=1e-4, fused Pallas stiffness, "
                  "f64-refined), seconds per OC iteration")
    else:
        headline_s, headline_ref = s3d, REF_3D_192_S_PER_ITER
        metric = ("3D cantilever_flexion 192x96x96 classic SIMP-OC (MGPCG "
                  "mgl=3 tol=1e-4, fused Pallas stiffness), seconds per OC "
                  "iteration")

    result = {
        "metric": metric,
        "value": round(headline_s, 5),
        "unit": "s/iter",
        "vs_baseline": round(headline_ref / headline_s, 3),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
