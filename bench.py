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
  4. 3D cantilever_flexion 256x128x128       (ref 2.8 s/iter steady,
     exact-config headline, mgl=5, lag=8      c1001.log)

CRASH ISOLATION (VERDICT r4 weak-1/next-1): hybrid in-process /
subprocess execution. While the in-process JAX backend is healthy,
stages run in-process (the axon tunnel handshake costs ~3-5 min per
fresh process, so paying it once is the fast path). The moment any
stage raises — e.g. the axon TPU worker crash (JaxRuntimeError
UNAVAILABLE, observed repeatedly 2026-08-19) that erased three stages
in BENCH_r04 by killing the shared backend — the orchestrator marks
the in-process backend dead and runs every subsequent attempt in its
OWN subprocess with a fresh backend, with one retry per stage after a
cool-down. The cumulative result JSON line is re-emitted after EVERY
stage (the last complete line is authoritative), so a wall-clock cutoff
cannot lose finished numbers; `value`/`vs_baseline` carry the
highest-priority completed headline (256-class > 192 > 2D > neural
fallback).

Stage order puts the reliable lag0 256-class number BEFORE the bonus
`_lag8` attempt: under the 2026-08-21 axon service regression any
scan(oc_step(precond=leaves)) program kills the TPU worker (ROUND5.md
§3), so the bonus stage runs last, isolated, without retry — it
overrides the headline (priority 4) only if the service executes it
again (280 ms/step = 10.0x in round 4).

Env knobs: NDR_BENCH_BUDGET (default 2400 s wall guard for starting the
256-class stages), NDR_BENCH_FAST=1 (skip 256), NDR_BENCH_LAG (precond
lag for the primary 256 stage, default 0 while the precond-scan fault
is live), NDR_BENCH_STAGES (comma list to run a subset), NDR_BENCH_RETRY
(retries per stage, default 1).
"""

import json
import os
import signal
import subprocess
import sys
import time


REF_2D_S_PER_ITER = 241.288 / 1500.0          # 2dMbb300x100.log

# Solver settings for the 256-class headline, chosen by the on-device
# scan-timed variant sweep (scripts/profile_oc.py --scan, logs/
# profile_oc_256_scan.json): bound-only lambda_max + degree-1 Chebyshev.
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


_METRIC_2D = "2D MBB 300x100 classic SIMP-OC, seconds per OC iteration"
_METRIC_192 = ("3D cantilever_flexion 192x96x96 classic SIMP-OC (MGPCG "
               "mgl=3 tol=1e-4, fused Pallas stiffness), seconds per OC "
               "iteration")
_METRIC_256 = ("3D cantilever_flexion 256x128x128 classic SIMP-OC "
               "(MGPCG mgl=5 tol=1e-4, fused Pallas stiffness, "
               "f64-refined), seconds per OC iteration")
_METRIC_256_LAG8 = ("3D cantilever_flexion 256x128x128 classic SIMP-OC "
                    "(MGPCG mgl=5 tol=1e-4, fused Pallas stiffness, "
                    "f64-refined, lagged preconditioner), seconds per OC "
                    "iteration")


# ---------------------------------------------------------------------------
# Stage runners (executed inside the per-stage subprocess)
# ---------------------------------------------------------------------------

def _run_stage_2d():
    s, c = _classic_bench("problems/2d/mbb_beam.json", None, 2, warm=10, n=50)
    return {"s_per_iter": round(s, 5),
            "ref_s_per_iter": round(REF_2D_S_PER_ITER, 4),
            "speedup": round(REF_2D_S_PER_ITER / s, 2),
            "compliance_at_measurement": round(c, 2)}


def _run_stage_192():
    s, c = _classic_bench("problems/3d/cantilever_flexion.json",
                          (192, 96, 96), 3, warm=5, n=20)
    return {"s_per_iter": round(s, 5),
            "ref_s_per_iter": round(REF_3D_192_S_PER_ITER, 4),
            "ref_basis": ("per-voxel extrapolation of c1001.log "
                          "(2.8 s/iter at 4.19M voxels)"),
            "speedup": round(REF_3D_192_S_PER_ITER / s, 2),
            "compliance_at_measurement": round(c, 2)}


def _run_stage_neural():
    s, c = _neural_bench()
    return {"s_per_iter": round(s, 5),
            "ref_s_per_iter": round(REF_NEURAL64_S_PER_ITER, 4),
            "speedup": round(REF_NEURAL64_S_PER_ITER / s, 2),
            "compliance_at_measurement": round(c, 2),
            "note": ("steady-state after 40 hardening steps "
                     "(it/s from init is ~2.5x higher)")}


def _run_stage_256():
    # n=32 matches the profiler's scan-of-32 program shape so the
    # persistent compile cache built by scripts/profile_oc.py --scan is
    # reused (a fresh scan length would recompile ~10 min cold).
    # precond_lag=8: hierarchy + coarsest factor rebuilt every 8 OC
    # steps (the CG operator stays exact — solves land on the same
    # trajectory), with precond_refresh_fine rebuilding the fine-level
    # smoother state every step. Chosen by the on-device A/B
    # logs/profile_oc_256_lagrf.{log,json}: base 355.97 ms, lag4 291.24,
    # lag8 280.49 with cg_iters pinned at 1 (without the fine refresh
    # lag8 went stale: 333.8 ms at cg 5). NDR_BENCH_LAG=0 restores the
    # rebuild-every-step baseline.
    # 2026-08-21 service regression (ROUND5.md §3): ANY program that runs
    # scan(oc_step(precond=leaves)) — fused or split build — now kills
    # the axon TPU worker deterministically (5/5 fresh backends at both
    # 256-class and 192-class), while the identical program measured
    # 280 ms/step in round 4 and the non-precond scan still runs clean.
    # The PRIMARY stage therefore runs rebuild-every-step (lag=0,
    # 0.359 s/iter = 7.8x, reliable) so the headline lands early; the
    # budget-gated BONUS stage `..._lag8` then attempts the 280 ms lag
    # combo once, overriding the headline only if the service executes
    # it again. NDR_BENCH_LAG flips the primary back if ever needed.
    lag = int(os.environ.get("NDR_BENCH_LAG", "0"))
    s, c = _classic_bench("problems/3d/cantilever_flexion.json",
                          (256, 128, 128), 5, warm=5, n=32,
                          settings_kw=BEST_256_SETTINGS, precond_lag=lag)
    return {"s_per_iter": round(s, 5), "ref_s_per_iter": REF_3D_256_S_PER_ITER,
            "ref_basis": "c1001.log steady state (exact config match)",
            "precond_lag": lag,
            "speedup": round(REF_3D_256_S_PER_ITER / s, 2),
            "compliance_at_measurement": round(c, 2)}


def _run_stage_256_lag8():
    """Bonus attempt at the lagged-preconditioner combo (280 ms/step in
    round 4, logs/profile_oc_256_combo.json). Crashes the TPU worker
    under the 2026-08-21 service regression — run LAST, no retry, only
    with budget to spare; a success outranks the lag0 headline."""
    s, c = _classic_bench("problems/3d/cantilever_flexion.json",
                          (256, 128, 128), 5, warm=5, n=32,
                          settings_kw=BEST_256_SETTINGS, precond_lag=8)
    return {"s_per_iter": round(s, 5), "ref_s_per_iter": REF_3D_256_S_PER_ITER,
            "ref_basis": "c1001.log steady state (exact config match)",
            "precond_lag": 8,
            "speedup": round(REF_3D_256_S_PER_ITER / s, 2),
            "compliance_at_measurement": round(c, 2)}


# key -> (runner, headline metric or None, ref s/iter, priority,
#         subprocess timeout seconds)
# Headline priority: exact-config 256-class > 192 > 2D > neural fallback.
_STAGES = {
    # Subprocess timeouts are sized for a COLD persistent cache through a
    # slow remote-compile day: on 2026-08-20 the axon compile service ran
    # ~4x slower than round 4 (192-class scan cold compile ~31 min vs the
    # usual ~8; 2D ~10 min). Warm-cache runs finish each stage in <2 min.
    "classic_2d_mbb_300x100": (_run_stage_2d, _METRIC_2D,
                               REF_2D_S_PER_ITER, 1, 2400),
    "classic_3d_cantilever_192x96x96": (_run_stage_192, _METRIC_192,
                                        REF_3D_192_S_PER_ITER, 2, 3000),
    "neural_3d_bridge_64x32x16": (_run_stage_neural, None,
                                  REF_NEURAL64_S_PER_ITER, 0, 2400),
    "classic_3d_cantilever_256x128x128": (_run_stage_256, _METRIC_256,
                                          REF_3D_256_S_PER_ITER, 3, 3600),
    "classic_3d_cantilever_256x128x128_lag8": (
        _run_stage_256_lag8, _METRIC_256_LAG8, REF_3D_256_S_PER_ITER, 4, 1500),
}
_STAGE_ORDER = ["classic_2d_mbb_300x100", "classic_3d_cantilever_192x96x96",
                "neural_3d_bridge_64x32x16",
                "classic_3d_cantilever_256x128x128",
                "classic_3d_cantilever_256x128x128_lag8"]
# Env overrides applied to RETRY attempts (attempt >= 2) of a stage: a
# config-level fallback for failures that are deterministic for the
# primary config (e.g. the 2026-08-21 scan(oc_step(precond=...)) worker
# fault) rather than transient. Retrying the identical config would just
# crash again and erase the stage.
_STAGE_FALLBACK_ENV = {
    "classic_3d_cantilever_256x128x128": {"NDR_BENCH_LAG": "0"},
}
_RESULT_TAG = "NDR_STAGE_RESULT "


def _stage_child(key):
    """Child-process entry: run one stage, print the tagged result line."""
    from ndr_tpu.utils.jax_setup import setup
    setup()
    import jax
    dev = str(jax.devices()[0])
    out = _STAGES[key][0]()
    out["device"] = dev
    print(_RESULT_TAG + json.dumps(out), flush=True)


# ---------------------------------------------------------------------------
# Orchestrator (JAX-free parent)
# ---------------------------------------------------------------------------

class _Emitter:
    """Incremental result emission: after every completed sub-benchmark
    the FULL result-so-far JSON is re-printed as one line, so if a later
    stage is cut off by the driver's wall-clock limit the last complete
    line still carries every finished number. A SIGTERM handler (GNU
    timeout's first signal) emits one final line before dying."""

    def __init__(self):
        self.extra = {}
        self.results = {}   # key -> sub-dict with s_per_iter
        self.child = None   # running subprocess, for TERM forwarding
        signal.signal(signal.SIGTERM, self._on_term)

    def emit(self):
        best = None
        for key, sub in self.results.items():
            _, metric, ref, pri, _ = _STAGES[key]
            if "s_per_iter" not in sub:
                continue
            if best is None or pri > best[0]:
                best = (pri, key, metric, ref, sub["s_per_iter"])
        if best is not None:
            pri, key, metric, ref, s = best
            if metric is None:  # neural fallback headline
                metric = f"{key} (fallback headline), seconds per iteration"
            print(json.dumps({
                "metric": metric, "value": round(s, 5), "unit": "s/iter",
                "vs_baseline": round(ref / s, 3), "extra": self.extra,
            }), flush=True)
            return
        print(json.dumps({
            "metric": "no sub-benchmark completed", "value": None,
            "unit": "s/iter", "vs_baseline": None, "extra": self.extra,
        }), flush=True)

    def _on_term(self, signum, frame):
        self.extra["note_truncated"] = "SIGTERM before all stages finished"
        if self.child is not None and self.child.poll() is None:
            try:
                os.killpg(self.child.pid, signal.SIGKILL)
            except Exception:
                pass
        self.emit()
        sys.stdout.flush()
        os._exit(0)


def _spawn_stage(em, key, timeout_s, extra_env=None):
    """Run one stage in a fresh subprocess; return (sub_dict | None, err)."""
    cmd = [sys.executable, os.path.abspath(__file__), "--stage", key]
    env = dict(os.environ, **(extra_env or {}))
    try:
        proc = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=sys.stderr,
            text=True, start_new_session=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        em.child = proc
        try:
            out, _ = proc.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except Exception:
                proc.kill()
            proc.wait()
            return None, f"timeout after {timeout_s}s"
        finally:
            em.child = None
        result = None
        for line in (out or "").splitlines():
            if line.startswith(_RESULT_TAG):
                result = json.loads(line[len(_RESULT_TAG):])
        if proc.returncode != 0 and result is None:
            return None, f"subprocess rc={proc.returncode}"
        if result is None:
            return None, "no result line from subprocess"
        return result, None
    except Exception as e:  # noqa: BLE001
        return None, f"{type(e).__name__}: {e}"[:300]


def _inproc_stage(key, extra_env=None):
    """Run one stage in this process (fast path: shares the already-paid
    axon handshake + backend). Returns (sub_dict | None, err)."""
    try:
        os.environ.update(extra_env or {})
        from ndr_tpu.utils.jax_setup import setup
        setup()
        import jax
        dev = str(jax.devices()[0])
        out = _STAGES[key][0]()
        out["device"] = dev
        return out, None
    except Exception as e:  # noqa: BLE001 — record; caller demotes backend
        return None, f"{type(e).__name__}: {e}"[:300]


def main():
    t_start = time.perf_counter()
    budget = float(os.environ.get("NDR_BENCH_BUDGET", "2400"))
    retries = int(os.environ.get("NDR_BENCH_RETRY", "1"))
    em = _Emitter()
    # in-process until the shared backend is poisoned by a worker crash;
    # NDR_BENCH_ISOLATE=1 forces subprocess isolation from the start
    backend_ok = not os.environ.get("NDR_BENCH_ISOLATE")

    stages = _STAGE_ORDER
    sel = os.environ.get("NDR_BENCH_STAGES")
    if sel:
        stages = [s.strip() for s in sel.split(",") if s.strip() in _STAGES]

    for key in stages:
        _, metric, ref, pri, timeout_s = _STAGES[key]
        elapsed = time.perf_counter() - t_start
        stage_retries = retries
        if key.startswith("classic_3d_cantilever_256x128x128"):
            # Wall-clock guard: a COLD compile of the 256-class scan
            # program is ~8 min; only start the stage if that still fits
            # the budget. The persistent compilation cache
            # (utils/jax_setup.py) hides the cold compile on repeat runs.
            if os.environ.get("NDR_BENCH_FAST"):
                em.extra["note_256"] = "skipped (NDR_BENCH_FAST)"
                continue
            # the bonus lag8 stage reuses programs compiled this round
            # (persistent cache) and typically ends in a fast fault while
            # the §3 service regression is live — 500 s covers it; the
            # primary stage budgets for a cold ~8 min compile
            need = 500.0 if key.endswith("_lag8") else 900.0
            if elapsed + need > budget:
                em.extra[f"note_{key}"] = (
                    f"skipped: {elapsed:.0f}s elapsed of {budget:.0f}s "
                    f"budget leaves no room ({need:.0f}s needed)")
                continue
        if key == "classic_3d_cantilever_256x128x128_lag8":
            # Bonus stage: expected to fault while the precond-scan
            # service regression is live (ROUND5.md §3) — never retry
            # (a deterministic crash would just burn the budget) and
            # always isolate so the crash cannot poison the headline
            # results already recorded.
            stage_retries = 0
            backend_ok = False
        for attempt in range(stage_retries + 1):
            # deterministic-fault fallback: retries flip to the stage's
            # known-safe config instead of re-running the crashing one
            fb = _STAGE_FALLBACK_ENV.get(key) if attempt > 0 else None
            if fb:
                em.extra[f"note_fallback_{key}"] = fb
            if backend_ok:
                sub, err = _inproc_stage(key, fb)
                if sub is None:
                    # any in-process failure may have killed the shared
                    # backend (BENCH_r04: one UNAVAILABLE crash erased 3
                    # stages) — demote to subprocess isolation for this
                    # retry and all later stages
                    backend_ok = False
                    em.extra["note_isolation"] = (
                        f"in-process backend demoted after {key}: {err}")
            else:
                sub, err = _spawn_stage(em, key, timeout_s, fb)
            if sub is not None:
                dev = sub.pop("device", None)
                if dev:
                    em.extra.setdefault("device", dev)
                em.results[key] = sub
                em.extra[key] = sub
                break
            em.extra[key] = {"error": err, "attempt": attempt + 1}
            sys.stderr.write(f"[bench] stage {key} attempt {attempt + 1} "
                             f"failed: {err}\n")
            remaining = budget - (time.perf_counter() - t_start)
            if attempt < stage_retries and remaining > 300.0:
                # cool-down: give a crashed axon TPU worker time to
                # restart before the fresh backend reattaches
                time.sleep(60.0)
            else:
                break
        em.emit()
    em.emit()


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        _stage_child(sys.argv[2])
    else:
        main()
