"""Per-phase profile of one neural-TO training step at the 192x96x96
north-star scale (VERDICT r2 item 2: measure the MLP fwd/bwd vs solve
split before optimizing it).

Phases (each its own jitted program on warmed state):

  * step_total   — the full jitted train_step (MLP fwd -> satisfier ->
                   solve -> adjoint -> MLP bwd -> Adam)
  * density_fwd  — chunked MLP forward + volume satisfier
  * mlp_fwd      — chunked MLP forward alone
  * nn_grad      — value_and_grad of the compliance through the density
                   chain with a FIXED displacement field (the adjoint is
                   closed-form, so this isolates MLP fwd + remat-bwd +
                   filter/satisfier backprop — everything except the
                   MGPCG solve)
  * solve        — the warm MGPCG solve alone on a fixed density

`--chunk-sweep` re-times mlp_fwd / nn_grad at several chunk sizes;
`--precision-sweep` re-times them at matmul precisions default/high.

Usage:
  python scripts/profile_neural.py [--dims 192,96,96] [--reps 10]
      [--chunk-sweep] [--precision-sweep] [--out out.json]
"""

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

from ndr_tpu.utils.jax_setup import setup
setup()

import jax
import jax.numpy as jnp

from ndr_tpu import models
from ndr_tpu.fem import topopt
from ndr_tpu.io.problem import load_problem
from ndr_tpu.ops import volume as vol
from ndr_tpu.training.neural import NeuralTOConfig, build_trainer


def _readback(out):
    """Host-readback sync (block_until_ready can return early through the
    axon tunnel on some call patterns — see scripts/profile_oc.py). Only
    a few elements are transferred: tunnel bulk bandwidth can be as low
    as 22 MB/s."""
    import numpy as _np
    leaf = jax.tree_util.tree_leaves(out)[0]
    _np.asarray(jax.device_get(jnp.ravel(leaf)[:8]))


def timeit(fn, args, reps, name, results):
    t0 = time.perf_counter()
    out = fn(*args)
    _readback(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _readback(out)
    sec = (time.perf_counter() - t0) / reps
    results[name] = {"s": round(sec, 6), "compile_s": round(compile_s, 2)}
    print(f"{name:26s} {sec * 1e3:10.2f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return sec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prob", default="problems/3d/bridge.json")
    p.add_argument("--dims", default="192,96,96")
    p.add_argument("--v0", type=float, default=0.4)
    p.add_argument("--mgl", type=int, default=3)
    p.add_argument("--sigma", type=float, default=1.0)
    p.add_argument("--warm", type=int, default=10)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--chunk-sweep", action="store_true")
    p.add_argument("--precision-sweep", action="store_true")
    p.add_argument("--variants", default="",
                   help="comma list of full-step variants to time "
                        "(scan-amortized): mlpfast (1-pass bf16 hidden "
                        "matmuls), cheb1, mlpfast_cheb1")
    p.add_argument("--scan", type=int, default=20,
                   help="steps per dispatch for --variants timing")
    p.add_argument("--skip-phases", action="store_true",
                   help="skip the per-phase section and go straight to "
                        "--variants (crash isolation: the axon worker "
                        "has been observed to die mid-run, and one "
                        "process per variant loses the least work)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    cfg = load_problem(args.prob)
    cfg = dataclasses.replace(cfg, max_volume=args.v0)
    dims = tuple(int(d) for d in args.dims.split(","))
    ncfg = NeuralTOConfig(
        embedding_size=1024, n_neurons=512, n_layers=4,
        sigma=args.sigma, multigrid_levels=args.mgl,
        volume_constraint_satisfier="constrained_sigmoid", seed=cfg.seed,
    )
    results = {"dims": args.dims, "sigma": args.sigma,
               "device": str(jax.devices()[0])}
    if args.out:
        # merge into an existing out file so per-variant retry processes
        # accumulate into one artifact instead of clobbering each other
        import os
        if os.path.exists(args.out):
            try:
                with open(args.out) as f:
                    prior = json.load(f)
                prior.update(results)
                results = prior
            except (json.JSONDecodeError, OSError):
                pass

    if args.skip_phases:
        _run_variants(args, cfg, ncfg, dims, results)
        return

    state, train_step, aux = build_trainer(cfg, ncfg, dims=dims)
    prob, coords, solve = aux["prob"], aux["coords"], aux["solve"]
    mlp_cfg, density_fn = aux["mlp_cfg"], aux["density_fn"]

    t0 = time.perf_counter()
    state, metrics = train_step(state)
    jax.block_until_ready(state.u)
    print(f"first step (cold): {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(args.warm - 1):
        state, metrics = train_step(state)
    jax.block_until_ready(state.u)
    print(f"warm cg_iters={int(metrics['cg_iters'])} "
          f"loss={float(metrics['loss']):.4f}", flush=True)
    results["warm_cg_iters"] = int(metrics["cg_iters"])

    # train_step donates its state: thread it through the reps
    t0 = time.perf_counter()
    for _ in range(args.reps):
        state, metrics = train_step(state)
    jax.block_until_ready(state.u)
    sec = (time.perf_counter() - t0) / args.reps
    results["step_total"] = {"s": round(sec, 6)}
    print(f"{'step_total':26s} {sec * 1e3:10.2f} ms", flush=True)

    mv = jnp.asarray(cfg.max_volume, jnp.float32)
    # coords as an operand, not a closure constant: closure arrays are
    # inlined as dense StableHLO literals (21 MB here, tripled under
    # grad) — observed 65 MB modules crashing the remote compile service
    coords = jax.device_put(coords)
    dfwd = jax.jit(lambda p, b, xs: density_fn(p, b, xs, mv))
    timeit(dfwd, (state.params, state.buffers, coords), args.reps,
           "density_fwd", results)

    def mlp_fwd(p, b, xs, chunk, precision):
        c = dataclasses.replace(mlp_cfg, matmul_precision=precision)
        return models.mlp_apply_chunked(p, b, xs, c, max_points=chunk)

    u_fixed = state.u
    rho_fixed = dfwd(state.params, state.buffers, coords)
    jax.block_until_ready((u_fixed, rho_fixed))

    def nn_loss(p, b, xs, uf, chunk, precision):
        # uf (the fixed displacement) must be an operand: closed over, its
        # 43.6 MB f64 literal alone crashed the remote compile service
        c = dataclasses.replace(mlp_cfg, matmul_precision=precision)
        out = models.mlp_apply_chunked(p, b, xs, c,
                                       max_points=chunk)[..., 0]
        rho = vol.satisfy_volume_constraint(
            out, mv, mode=ncfg.volume_constraint_satisfier)
        return 2.0 * topopt.compliance_with_adjoint(rho, uf, prob)

    base_chunk = 1 << 17
    for prec in (["high", "default"] if args.precision_sweep else ["high"]):
        tag = "" if prec == "high" else f"_{prec}"
        timeit(jax.jit(lambda p, b, xs, pr=prec: mlp_fwd(p, b, xs, base_chunk, pr)),
               (state.params, state.buffers, coords), args.reps,
               f"mlp_fwd{tag}", results)
        timeit(jax.jit(jax.grad(
            lambda p, b, xs, uf, pr=prec: nn_loss(p, b, xs, uf, base_chunk, pr))),
            (state.params, state.buffers, coords, u_fixed), args.reps,
            f"nn_grad{tag}", results)

    if args.chunk_sweep:
        n = 1
        for d in dims:
            n *= d
        for chunk in (1 << 18, 1 << 19, 1 << 20, n):
            timeit(jax.jit(lambda p, b, xs, ck=chunk: mlp_fwd(p, b, xs, ck, "high")),
                   (state.params, state.buffers, coords), args.reps,
                   f"mlp_fwd_c{chunk}", results)
            timeit(jax.jit(jax.grad(
                lambda p, b, xs, uf, ck=chunk: nn_loss(p, b, xs, uf, ck, "high"))),
                (state.params, state.buffers, coords, u_fixed), args.reps,
                f"nn_grad_c{chunk}", results)

    sfn = jax.jit(lambda r, u: solve(r, u))
    timeit(sfn, (rho_fixed, u_fixed), max(args.reps // 2, 3),
           "solve", results)

    _run_variants(args, cfg, ncfg, dims, results)


# full-step variants (fresh trainer per variant, scan-timed)
VARIANTS = {
    "base": {},
    "mlpfast": {"matmul_precision": "default"},
    "cheb1": {"cheb_degree": 1},
    "mlpfast_cheb1": {"matmul_precision": "default", "cheb_degree": 1},
    # classic production levers ported to the neural trainer (round 5):
    # lagged preconditioner with per-solve fine refresh
    "lag8": {"precond_lag": 8},
    "cheb1_lag8": {"cheb_degree": 1, "precond_lag": 8},
    "combo": {"matmul_precision": "default", "cheb_degree": 1,
              "precond_lag": 8},
}


def _run_variants(args, cfg, ncfg, dims, results):
    for name in [v for v in args.variants.split(",") if v]:
        vcfg = dataclasses.replace(ncfg, **VARIANTS[name])
        vstate, vstep, vaux = build_trainer(cfg, vcfg, dims=dims)
        lag = vcfg.precond_lag
        if lag > 1:
            build_pc = jax.jit(vaux["build_precond_from_state"])

            def vstep(s, _step=vstep, _bp=build_pc, _lag=lag,
                      _box=[None, 0]):
                # host-loop lagged preconditioner: rebuild leaves every
                # _lag calls (same semantics as neural.train's lag path)
                if _box[1] % _lag == 0:
                    _box[0] = _bp(s)
                _box[1] += 1
                return _step(s, precond=_box[0])

        t0 = time.perf_counter()
        vstate, vm = vstep(vstate)
        jax.block_until_ready(vstate.u)
        print(f"variant {name}: cold {time.perf_counter() - t0:.1f}s",
              flush=True)
        for _ in range(args.warm - 1):
            vstate, vm = vstep(vstate)
        _readback(vm["compliance"])

        # scan-of-K steps in one dispatch amortizes tunnel latency; the
        # jitted vstep dispatches per step otherwise (donation makes the
        # python loop cheap but each dispatch pays ~10 ms through axon)
        K = args.scan
        t0 = time.perf_counter()
        for _ in range(K):
            vstate, vm = vstep(vstate)
        last_c = float(vm["compliance"])
        _readback(vm["compliance"])
        sec = (time.perf_counter() - t0) / K
        results[f"variant_{name}"] = {
            "s": round(sec, 6), "loop": K,
            "cg_iters": int(vm["cg_iters"]),
            "compliance": round(2 * last_c, 4)}
        print(f"{'variant_' + name:26s} {sec * 1e3:10.2f} ms/step "
              f"(cg {int(vm['cg_iters'])})", flush=True)
        if args.out:  # incremental: a killed run keeps finished variants
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)
        del vstate, vstep, vaux

    print(json.dumps(results, indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
