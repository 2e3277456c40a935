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

Emits the cumulative result JSON line after EVERY completed sub-bench
(the last complete line is authoritative), so a wall-clock cutoff in a
later stage cannot lose the earlier numbers; `value` is the headline 3D
classic s/iter, `vs_baseline` its speedup; per-bench numbers in `extra`.
The exact-config 256x128x128 headline (ref 2.8 s/iter, c1001.log) runs
last behind a budget guard (NDR_BENCH_BUDGET, default 2400 s; cold
compile ~8 min, warm via the persistent cache ~2 min). NDR_BENCH_FAST=1
skips it during development.
"""

import json
import os
import signal
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
        # Lagged preconditioner as a nested scan: the outer body builds
        # the hierarchy leaves once, the inner scan runs `precond_lag`
        # OC steps against them as a loop-invariant. The leaves must NOT
        # ride a scan carry — that double-buffers the ~1.5 GB leaf set
        # (level-1 cached Ke is 1.2 GB at 256-class) and exhausts v5e
        # HBM (same program shape as profile_oc.py's <base>_lagN).
        n_blocks = max(1, n // precond_lag)
        n_steps = n_blocks * precond_lag

        @jax.jit
        def run_k_lag(s):
            def block(s, _):
                leaves = solve.build_precond(top.physical_density(s.x))
                def body(s, _):
                    s, m = topopt.oc_step(top, s, precond=leaves)
                    return s, (m["compliance"], m["cg_iters"])
                return jax.lax.scan(body, s, None, length=precond_lag)
            s, ms = jax.lax.scan(block, s, None, length=n_blocks)
            return s, jax.tree_util.tree_map(
                lambda a: a.reshape((n_steps,) + a.shape[2:]), ms)

        state, (cs, its) = run_k_lag(state)     # compile + warm
        _readback(cs)
        t0 = time.perf_counter()
        state, (cs, its) = run_k_lag(state)
        last_c = _readback(cs[-1:])
        sec = (time.perf_counter() - t0) / n_steps
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


_METRIC_192 = ("3D cantilever_flexion 192x96x96 classic SIMP-OC (MGPCG "
               "mgl=3 tol=1e-4, fused Pallas stiffness), seconds per OC "
               "iteration")
_METRIC_256 = ("3D cantilever_flexion 256x128x128 classic SIMP-OC "
               "(MGPCG mgl=5 tol=1e-4, fused Pallas stiffness, "
               "f64-refined, lagged preconditioner), seconds per OC "
               "iteration")


class _Emitter:
    """Incremental result emission (VERDICT r3 weak-2): after every
    completed sub-benchmark the FULL result-so-far JSON is re-printed as
    one line, so if a later stage is cut off by the driver's wall-clock
    limit the last complete line still carries every finished number.
    A SIGTERM handler (GNU timeout's first signal) emits one final line
    before dying."""

    def __init__(self):
        self.extra = {}
        self.headline = None  # (value_s, ref_s, metric)
        signal.signal(signal.SIGTERM, self._on_term)

    def emit(self):
        if self.headline is not None:
            s, ref, metric = self.headline
            print(json.dumps({
                "metric": metric, "value": round(s, 5), "unit": "s/iter",
                "vs_baseline": round(ref / s, 3), "extra": self.extra,
            }), flush=True)
            return
        # No classic stage has finished yet. Fall back to any finished
        # sub-benchmark (e.g. neural when the classic stages hit a TPU
        # worker fault) so the driver never records parsed=null when
        # SOMETHING measured; emit an explicit error line as last resort.
        for key in ("neural_3d_bridge_64x32x16",):
            sub = self.extra.get(key)
            if isinstance(sub, dict) and "s_per_iter" in sub:
                print(json.dumps({
                    "metric": f"{key} (fallback headline), seconds per iteration",
                    "value": sub["s_per_iter"], "unit": "s/iter",
                    "vs_baseline": sub["speedup"], "extra": self.extra,
                }), flush=True)
                return
        print(json.dumps({
            "metric": "no sub-benchmark completed", "value": None,
            "unit": "s/iter", "vs_baseline": None, "extra": self.extra,
        }), flush=True)

    def _on_term(self, signum, frame):
        self.extra["note_truncated"] = "SIGTERM before all stages finished"
        self.emit()
        sys.stdout.flush()
        os._exit(0)


def main():
    import jax

    from ndr_tpu.utils.jax_setup import setup
    setup()

    t_start = time.perf_counter()
    budget = float(os.environ.get("NDR_BENCH_BUDGET", "2400"))
    em = _Emitter()
    em.extra["device"] = str(jax.devices()[0])

    def _stage(key, fn):
        """Run one sub-benchmark, absorbing device faults: an axon TPU
        worker crash (JaxRuntimeError UNAVAILABLE — observed repeatedly
        on 2026-08-19) in one stage must not erase the stages that
        already finished or stop the later ones from being attempted."""
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — record and move on
            em.extra[key] = {"error": f"{type(e).__name__}: {e}"[:300]}
            em.emit()
            return None

    r = _stage("classic_2d_mbb_300x100",
               lambda: _classic_bench("problems/2d/mbb_beam.json", None, 2,
                                      warm=10, n=50))
    if r:
        s2d, c2d = r
        em.extra["classic_2d_mbb_300x100"] = {
            "s_per_iter": round(s2d, 5), "ref_s_per_iter": round(REF_2D_S_PER_ITER, 4),
            "speedup": round(REF_2D_S_PER_ITER / s2d, 2),
            "compliance_at_measurement": round(c2d, 2),
        }
        em.headline = (s2d, REF_2D_S_PER_ITER,
                       "2D MBB 300x100 classic SIMP-OC, seconds per OC iteration")
        em.emit()

    r = _stage("classic_3d_cantilever_192x96x96",
               lambda: _classic_bench("problems/3d/cantilever_flexion.json",
                                      (192, 96, 96), 3, warm=5, n=20))
    if r:
        s3d, c3d = r
        em.extra["classic_3d_cantilever_192x96x96"] = {
            "s_per_iter": round(s3d, 5),
            "ref_s_per_iter": round(REF_3D_192_S_PER_ITER, 4),
            "ref_basis": "per-voxel extrapolation of c1001.log (2.8 s/iter at 4.19M voxels)",
            "speedup": round(REF_3D_192_S_PER_ITER / s3d, 2),
            "compliance_at_measurement": round(c3d, 2),
        }
        em.headline = (s3d, REF_3D_192_S_PER_ITER, _METRIC_192)
        em.emit()

    r = _stage("neural_3d_bridge_64x32x16", _neural_bench)
    if r:
        sn, cn = r
        em.extra["neural_3d_bridge_64x32x16"] = {
            "s_per_iter": round(sn, 5), "ref_s_per_iter": round(REF_NEURAL64_S_PER_ITER, 4),
            "speedup": round(REF_NEURAL64_S_PER_ITER / sn, 2),
            "compliance_at_measurement": round(cn, 2),
            "note": "steady-state after 40 hardening steps (it/s from init is ~2.5x higher)",
        }
        em.emit()

    # Headline: the exact-config 4.19M-voxel run of the reference's
    # c1001.log (2.8 s/iter on its 128-CPU production node). Apples to
    # apples — same problem JSON, same grid, mgl=5. The persistent
    # compilation cache (utils/jax_setup.py) hides the cold compile on
    # repeat runs. Wall-clock guard: a COLD compile of the scan program
    # is ~8 min; only start the stage if that still fits the budget
    # (NDR_BENCH_BUDGET, default 2400 s). NDR_BENCH_FAST=1 skips it.
    elapsed = time.perf_counter() - t_start
    cold_compile_s = 700.0
    if os.environ.get("NDR_BENCH_FAST"):
        em.extra["note_256"] = "skipped (NDR_BENCH_FAST)"
    elif elapsed + cold_compile_s + 200.0 > budget:
        em.extra["note_256"] = (
            f"skipped: {elapsed:.0f}s elapsed of {budget:.0f}s budget "
            "leaves no room for a cold 256-class compile")
    else:
        # n=32 matches the profiler's scan-of-32 program shape so the
        # persistent compile cache built by scripts/profile_oc.py --scan
        # is reused (a fresh scan length would recompile ~10 min cold).
        # precond_lag=8: hierarchy + coarsest factor rebuilt every 8 OC
        # steps (the CG operator stays exact — solves land on the same
        # trajectory), with precond_refresh_fine rebuilding the fine-
        # level smoother state every step. Chosen by the on-device A/B
        # logs/profile_oc_256_lagrf.{log,json}: base 355.97 ms, lag4
        # 291.24, lag8 280.49 with cg_iters pinned at 1 (without the
        # fine refresh lag8 went stale: 333.8 ms at cg 5, lag.json).
        # NDR_BENCH_LAG=0 restores the rebuild-every-step baseline.
        lag = int(os.environ.get("NDR_BENCH_LAG", "8"))
        r = _stage("classic_3d_cantilever_256x128x128",
                   lambda: _classic_bench(
                       "problems/3d/cantilever_flexion.json", (256, 128, 128),
                       5, warm=5, n=32, settings_kw=BEST_256_SETTINGS,
                       precond_lag=lag))
        if r:
            s256, c256 = r
            em.extra["classic_3d_cantilever_256x128x128"] = {
                "s_per_iter": round(s256, 5), "ref_s_per_iter": REF_3D_256_S_PER_ITER,
                "ref_basis": "c1001.log steady state (exact config match)",
                "speedup": round(REF_3D_256_S_PER_ITER / s256, 2),
                "compliance_at_measurement": round(c256, 2),
            }
            em.headline = (s256, REF_3D_256_S_PER_ITER, _METRIC_256)
    em.emit()


if __name__ == "__main__":
    main()
