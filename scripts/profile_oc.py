"""Per-phase profile of one classic OC step at production scale.

VERDICT r2 item 1: before optimizing, commit a breakdown of where the
0.56 s/iter at 256x128x128 goes. Times each phase of the OC step as its
own jitted program on realistic (hardened) state:

  * step_total      — the full jitted oc_step
  * objective       — MGPCG solve + compliance (warm start)
  * grads           — adjoint objective gradient + constraint gradient
  * hier            — build_level_states + factor_coarsest (Galerkin
                      rebuild, diag blocks, lmax, coarse Cholesky)
  * precond         — one MG preconditioner application (delta method:
                      (hier + k preconds) - hier, / k)
  * fine_apply_*    — single fine-level stiffness applies (pallas / XLA)
  * df_residual     — two-float float64-accurate residual kernel
  * l1_transfer     — level-1 apply as restrict(K_fine(prolong(u)))
  * l1_ke_build /   — materializing the level-1 Galerkin Ke and applying
    l1_cached         it (the cached alternative to l1_transfer)
  * filter_chain    — one physical-density evaluation
  * oc_overhead     — step_total - objective - grads (bisection etc.)

`--variants` re-times the full step under alternative solver settings
(vcycle-only preconditioner, cached level-1 Ke, bound-only lambda_max,
chebyshev degree) to pick the production configuration.

Usage:
  python scripts/profile_oc.py --dims 256,128,128 --mgl 5 --warm 20 \
      --phases --variants fmg0,kecache,lmax0 [--reps 20] [--out out.json]
"""

import argparse
import json
import re
import sys
import time

sys.path.insert(0, ".")

from ndr_tpu.utils.jax_setup import setup
setup()

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ndr_tpu.fem import multigrid as mg
from ndr_tpu.fem import operators as ops
from ndr_tpu.fem import pallas_kernels as pk
from ndr_tpu.fem import topopt
from ndr_tpu.fem.simulator import problem_from_config
from ndr_tpu.io.problem import load_problem
from ndr_tpu.ops import filters as flt


def _readback(out):
    """Host-readback sync: through the axon tunnel block_until_ready has
    been observed to return early on some call patterns; transferring a
    FEW ELEMENTS of one leaf is a reliable fence. (Never device_get a
    full field: tunnel bulk bandwidth has been measured as low as
    22 MB/s, so a 154 MB leaf would add 1.7 s to the measurement.)"""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:8]))


def timeit(fn, args, reps, name, results):
    t_c0 = time.perf_counter()
    out = fn(*args)
    _readback(out)
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _readback(out)
    sec = (time.perf_counter() - t0) / reps
    results[name] = {"s": round(sec, 6), "compile_s": round(compile_s, 2)}
    print(f"{name:24s} {sec * 1e3:10.2f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return sec


def build(args, settings_kw=None):
    cfg = load_problem(args.prob)
    dims = tuple(int(d) for d in args.dims.split(","))
    prob, grid = problem_from_config(cfg, dims=dims, dtype=jnp.float32)
    kw = dict(
        num_levels=args.mgl, cg_iter=100, tol=1e-4, mg_iterations=1,
        mg_smoothing_iterations=2, full_multigrid=True,
        smoother="chebyshev", cheb_degree=2, use_pallas="auto",
    )
    if getattr(args, "settings", None):
        kw.update(json.loads(args.settings))
    if settings_kw:
        kw.update(settings_kw)
    settings = mg.MGSolverSettings(**kw)
    solve = mg.make_mg_solver(prob, settings)
    top = topopt.TopologyOptimizationProblem(
        prob=prob,
        filters=[flt.SmoothingFilter(radius=1),
                 flt.ProjectionFilter(beta=1.0)],
        max_volume=cfg.max_volume,
        solve=solve,
    )
    return cfg, prob, grid, settings, top


def warm_state(top, cfg, grid, prob, warm):
    state = topopt.oc_init(
        top, jnp.full(grid.dims, cfg.max_volume, prob.force.dtype))
    step = jax.jit(lambda s: topopt.oc_step(top, s))
    t0 = time.perf_counter()
    state, metrics = step(state)
    jax.block_until_ready(state.x)
    print(f"first step (cold): {time.perf_counter() - t0:.1f}s", flush=True)
    for i in range(warm - 1):
        state, metrics = step(state)
    jax.block_until_ready(state.x)
    print(f"warm cg_iters={int(metrics['cg_iters'])} "
          f"compliance={2 * float(metrics['compliance']):.3f}", flush=True)
    return state, step, metrics


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prob", default="problems/3d/cantilever_flexion.json")
    p.add_argument("--dims", default="256,128,128")
    p.add_argument("--mgl", type=int, default=5)
    p.add_argument("--warm", type=int, default=20)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--phases", action="store_true")
    p.add_argument("--phases-mg", action="store_true",
                   help="MG-internal breakdown (per-level smooth/vcycle/"
                        "transfer/hier sub-phases)")
    p.add_argument("--settings", default=None,
                   help='JSON dict of MGSolverSettings overrides applied '
                        'to the base build, e.g. \'{"lmax_power_iters":0,'
                        '"cheb_degree":1}\'')
    p.add_argument("--variants", default="")
    p.add_argument("--precond-k", type=int, default=4)
    p.add_argument("--scan", type=int, default=0,
                   help="time variants as a jitted lax.scan of N steps "
                        "(one dispatch; amortizes tunnel latency)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    cfg, prob, grid, settings, top = build(args)
    ndim = grid.ndim
    results = {"dims": args.dims, "mgl": args.mgl,
               "device": str(jax.devices()[0])}

    state, step, metrics = warm_state(top, cfg, grid, prob, args.warm)
    results["warm_cg_iters"] = int(metrics["cg_iters"])

    if args.phases:
        t_step = timeit(step, (state,), args.reps, "step_total", results)

        # realistic fields
        rho = jax.jit(top.physical_density)(state.x)
        young32 = jax.jit(
            lambda r: prob.young(r).astype(jnp.float32))(rho)
        u64 = state.u
        u32 = u64.astype(jnp.float32)
        jax.block_until_ready((rho, young32, u32))

        mgcfg = mg.build_mg_config(
            prob, settings.num_levels,
            ke_cache_limit_bytes=settings.ke_cache_limit_bytes)
        use_pallas = mg.resolve_use_pallas(settings.use_pallas, grid)

        objective = jax.jit(lambda x, u0: top.objective(x, u0))
        timeit(objective, (state.x, u64), args.reps, "objective", results)

        grads = jax.jit(lambda x, u: (top.objective_gradient(x, u),
                                      top.constraint_gradient(x)))
        timeit(grads, (state.x, u64), args.reps, "grads", results)

        def hier_arrays(young):
            levels = mg.build_level_states(
                cfg=mgcfg, prob=prob, young=young,
                smoother=settings.smoother,
                power_iters=settings.lmax_power_iters,
                use_pallas=use_pallas,
                cached_ke_dtype=settings.cached_ke_dtype)
            chol = mg.factor_coarsest(
                levels, mg._resolve_coarse_solver(settings, levels))
            outs = [lv.Minv_rows for lv in levels]
            outs += [lv.Ke for lv in levels if lv.Ke is not None]
            outs += [lv.Ke_stream for lv in levels if lv.Ke_stream is not None]
            outs += [lv.Dinv for lv in levels if lv.Dinv is not None]
            outs += [lv.lmax for lv in levels if lv.lmax is not None]
            outs.append(chol[1][0] if chol[0] == 'chol' else chol[1])
            return outs

        t_hier = timeit(jax.jit(hier_arrays), (young32,), args.reps,
                        "hier", results)

        K = args.precond_k

        def hier_plus_precond(young, r):
            levels = mg.build_level_states(
                cfg=mgcfg, prob=prob, young=young,
                smoother=settings.smoother,
                power_iters=settings.lmax_power_iters,
                use_pallas=use_pallas,
                cached_ke_dtype=settings.cached_ke_dtype)
            chol = mg.factor_coarsest(
                levels, mg._resolve_coarse_solver(settings, levels))

            def body(i, r):
                return mg.mg_preconditioner(
                    levels, chol, r, settings.mg_iterations,
                    settings.mg_smoothing_iterations,
                    settings.full_multigrid, settings.smoother,
                    settings.cheb_degree)
            return jax.lax.fori_loop(0, K, body, r)

        r0 = jnp.asarray(prob.force, jnp.float32)
        t_hp = timeit(jax.jit(hier_plus_precond), (young32, r0), args.reps,
                      f"hier_plus_{K}_preconds", results)
        per_precond = (t_hp - t_hier) / K
        results["precond"] = {"s": round(per_precond, 6)}
        print(f"{'precond (delta)':24s} {per_precond * 1e3:10.2f} ms",
              flush=True)

        on_tpu = jax.devices()[0].platform != "cpu"
        K0np = np.asarray(mgcfg.K0, np.float64)
        if on_tpu:
            timeit(jax.jit(lambda u, y: pk.apply_k_pallas(u, y, K0np, grid)),
                   (u32, young32), args.reps, "fine_apply_pallas", results)
        K0j = jnp.asarray(K0np, jnp.float32)
        timeit(jax.jit(lambda u, y: ops.apply_k(u, y, K0j, grid)),
               (u32, young32), max(args.reps // 4, 3), "fine_apply_xla",
               results)

        # two-float residual ingredients
        young64 = ops.element_young_modulus(
            rho.astype(jnp.float64), prob.E0, prob.Emin, prob.gamma)
        y_hi = young64.astype(jnp.float32)
        y_lo = (young64 - y_hi.astype(jnp.float64)).astype(jnp.float32)
        u_hi = u64.astype(jnp.float32)
        u_lo = (u64 - u_hi.astype(jnp.float64)).astype(jnp.float32)
        jax.block_until_ready((y_hi, y_lo, u_hi, u_lo))
        if on_tpu:
            timeit(jax.jit(lambda a, b, c, d: pk.apply_k_pallas_df(
                a, b, c, d, K0np, grid)),
                (u_hi, u_lo, y_hi, y_lo), args.reps, "df_residual", results)

        # level-1 apply alternatives
        grid1 = mgcfg.levels[1].grid
        u1 = jnp.zeros(grid1.nodes_per_dim + (ndim,), jnp.float32)
        u1 = u1.at[tuple(n // 2 for n in grid1.nodes_per_dim)].set(1.0)

        def l1_transfer(u1v, y):
            uf = mg.prolongate(u1v, ndim)
            f = (pk.apply_k_pallas(uf, y, K0np, grid) if use_pallas
                 else ops.apply_k(uf, y, K0j, grid))
            return mg.restrict(f, ndim)

        timeit(jax.jit(l1_transfer), (u1, young32), args.reps,
               "l1_transfer_apply", results)

        ke1_build = jax.jit(lambda y: mg.build_level_ke(mgcfg, y, 1))
        timeit(ke1_build, (young32,), max(args.reps // 4, 3),
               "l1_ke_build", results)
        Ke1 = ke1_build(young32)
        jax.block_until_ready(Ke1)
        timeit(jax.jit(lambda uv, ke: ops.apply_k_cached(uv, ke, grid1)),
               (u1, Ke1), args.reps, "l1_cached_apply", results)
        del Ke1

        timeit(jax.jit(top.physical_density), (state.x,), args.reps,
               "filter_chain", results)

        oc_overhead = (t_step - results["objective"]["s"]
                       - results["grads"]["s"])
        results["oc_overhead"] = {"s": round(oc_overhead, 6)}
        print(f"{'oc_overhead (delta)':24s} {oc_overhead * 1e3:10.2f} ms",
              flush=True)

    if args.phases_mg:
        # MG-internal breakdown: where does one preconditioner
        # application go, level by level? Each sub-phase is timed as
        # hier-rebuild + K x phase (fori_loop) and reported as the delta
        # over the hier-only time, /K. The hierarchy is rebuilt INSIDE
        # jit from the `young` operand so no 100+ MB level array inlines
        # as a StableHLO literal (the remote compile service rejects
        # oversized modules).
        rho = jax.jit(top.physical_density)(state.x)
        young32 = jax.jit(
            lambda r: prob.young(r).astype(jnp.float32))(rho)
        jax.block_until_ready(young32)
        mgcfg = mg.build_mg_config(
            prob, settings.num_levels,
            ke_cache_limit_bytes=settings.ke_cache_limit_bytes)
        use_pallas = mg.resolve_use_pallas(settings.use_pallas, grid)
        nsm = settings.mg_smoothing_iterations
        deg = settings.cheb_degree * nsm

        def build_levels(young):
            levels = mg.build_level_states(
                cfg=mgcfg, prob=prob, young=young,
                smoother=settings.smoother,
                power_iters=settings.lmax_power_iters,
                use_pallas=use_pallas,
                cached_ke_dtype=settings.cached_ke_dtype)
            return levels, mg.factor_coarsest(
                levels, mg._resolve_coarse_solver(settings, levels))

        def hier_only(young):
            levels, chol = build_levels(young)
            outs = [lv.Minv_rows for lv in levels]
            outs += [lv.Ke for lv in levels if lv.Ke is not None]
            outs += [lv.Ke_stream for lv in levels
                     if lv.Ke_stream is not None]
            outs += [lv.Dinv for lv in levels if lv.Dinv is not None]
            outs.append(chol[1][0] if chol[0] == 'chol' else chol[1])
            return outs

        t_hier = timeit(jax.jit(hier_only), (young32,), args.reps,
                        "hier", results)

        r0 = jnp.asarray(prob.force, jnp.float32)
        K = args.precond_k

        def phase(name, body_fn, carry0, reps=None):
            # carry0 doubles as the operand `b` where the phase needs a
            # fixed rhs — passed as a jit operand, NOT closed over (a
            # closed-over 51 MB force field inlines as a StableHLO
            # literal and bloats the remote compile)
            def fn(young, c0, b):
                levels, chol = build_levels(young)

                def body(i, c):
                    return body_fn(levels, chol, c, b)
                return jax.lax.fori_loop(0, K, body, c0)

            t = timeit(jax.jit(fn), (young32, carry0, carry0),
                       reps or args.reps, f"mg_{name}_raw", results)
            per = (t - t_hier) / K
            results[f"mg_{name}"] = {"s": round(per, 6)}
            print(f"{'mg_' + name + ' (delta)':24s} {per * 1e3:10.2f} ms",
                  flush=True)

        ndim_ = grid.ndim

        # one full preconditioner application (fmg as configured)
        phase("precond", lambda lvs, ch, r, b: mg.mg_preconditioner(
            lvs, ch, r, settings.mg_iterations, nsm,
            settings.full_multigrid, settings.smoother,
            settings.cheb_degree), r0)
        # vcycle-only preconditioner (no FMG coarse bootstrap)
        phase("vcycle0", lambda lvs, ch, r, b: mg.vcycle(
            lvs, ch, 0, jnp.zeros_like(r), r, nsm, True,
            settings.smoother, settings.cheb_degree, x_zero=True), r0)
        # level-0 chebyshev smooth at the production degree
        phase("smooth0", lambda lvs, ch, r, b: mg.chebyshev_smooth(
            lvs[0], r, b, degree=deg)[0], r0)
        # level-0 residual (one stiffness apply + mask)
        phase("resid0", lambda lvs, ch, r, b: mg._zero_dirichlet(
            lvs[0], b - mg._apply_k_level(lvs[0], r)), r0)
        # level-0 block-Jacobi apply
        phase("dinv0", lambda lvs, ch, r, b: mg._dinv_apply(lvs[0], r), r0)
        # fine<->coarse transfer roundtrip
        phase("transfer0", lambda lvs, ch, r, b: mg.prolongate(
            mg.restrict(r, ndim_), ndim_)[
                tuple(slice(0, n) for n in r.shape)], r0)

        # everything below level 0: vcycle rooted at level 1
        rc0 = mg.restrict(r0, ndim_)
        phase("vcycle1", lambda lvs, ch, rc, b: mg.vcycle(
            lvs, ch, 1, jnp.zeros_like(rc), rc, nsm, True,
            settings.smoother, settings.cheb_degree, x_zero=True), rc0)
        # level-1 smooth alone
        phase("smooth1", lambda lvs, ch, rc, b: mg.chebyshev_smooth(
            lvs[1], rc, b, degree=deg)[0], rc0)
        if settings.num_levels >= 2:
            rcc0 = mg.restrict(rc0, ndim_)
            phase("vcycle2", lambda lvs, ch, rc, b: mg.vcycle(
                lvs, ch, 2, jnp.zeros_like(rc), rc, nsm, True,
                settings.smoother, settings.cheb_degree, x_zero=True),
                rcc0)

        # hier sub-phases. The carry-dependent perturbation (1e-30 * a
        # scalar of r) stops XLA hoisting the loop-invariant rebuild out
        # of the fori_loop; it does not measurably change the arithmetic.
        def _l0_diag(lvs, ch, r, b):
            y = lvs[0].young * (1.0 + 1e-30 * r[0, 0, 0, 0])
            D = ops.invert_blocks(ops.node_diag_blocks(y, mgcfg.K0, grid))
            return r + 1e-30 * D[..., 0, 0, None]

        phase("hier_l0_diag", _l0_diag, r0)

        def _l1_ke(lvs, ch, r, b):
            y = lvs[0].young * (1.0 + 1e-30 * r[0, 0, 0, 0])
            Ke = mg.build_level_ke(mgcfg, y, 1)
            return r + 1e-30 * jnp.sum(Ke)

        phase("hier_l1_ke", _l1_ke, r0)

    # ---- variant full-step timings ---------------------------------
    VARIANTS = {
        "base": dict(),
        "lmax0_smooth1": dict(lmax_power_iters=0,
                              mg_smoothing_iterations=1),
        "lmax0_cheb1": dict(lmax_power_iters=0, cheb_degree=1),
        "fmg0": dict(full_multigrid=False),
        "kecache": dict(ke_cache_limit_bytes=2048 * 2**20),
        "lmax0": dict(lmax_power_iters=0),
        "cheb1": dict(cheb_degree=1),
        "cheb3": dict(cheb_degree=3),
        "smooth1": dict(mg_smoothing_iterations=1),
        "fmg0_kecache": dict(full_multigrid=False,
                             ke_cache_limit_bytes=2048 * 2**20),
        "fmg0_kecache_lmax0": dict(full_multigrid=False,
                                   ke_cache_limit_bytes=2048 * 2**20,
                                   lmax_power_iters=0),
        "mgl4": dict(num_levels=4),
        "mgl3": dict(num_levels=3),
        # reference-parity smoother (incremental-residual multicolor GS)
        "gs": dict(smoother="gs"),
        # cheaper-smoothing combos on top of the winning lmax0 config
        "lmax0_cheb1_s": dict(lmax_power_iters=0, cheb_degree=1),
        "lmax0_smooth1_s": dict(lmax_power_iters=0,
                                mg_smoothing_iterations=1),
        "lmax0_cheb1_smooth1": dict(lmax_power_iters=0, cheb_degree=1,
                                    mg_smoothing_iterations=1),
        "lmax0_mgl4": dict(lmax_power_iters=0, num_levels=4),
        # production config + V-cycle-only preconditioner (FMG's coarse
        # bootstrap costs ~an extra half-preconditioner; warm-started CG
        # may not need it)
        "prod_fmg0": dict(lmax_power_iters=0, cheb_degree=1,
                          full_multigrid=False),
        # production config + one more coarsening (smaller coarsest
        # Cholesky, one more cheap level)
        "prod_mgl6": dict(lmax_power_iters=0, cheb_degree=1, num_levels=6),
        # production config + mg_iterations=2 (stronger preconditioner,
        # possibly cg_iters=1)
        "prod_mgi2": dict(lmax_power_iters=0, cheb_degree=1,
                          mg_iterations=2),
        "prod_mgl6_fmg0": dict(lmax_power_iters=0, cheb_degree=1,
                               num_levels=6, full_multigrid=False),
        # Newton-Schulz coarsest inverse (matmul-only; replaces the
        # serial-bound cho_factor) vs the Cholesky baseline, and mgl
        # re-sweeps now that the coarsest "factor" cost is MXU-bound
        "prod_ns": dict(lmax_power_iters=0, cheb_degree=1,
                        coarse_solver="ns"),
        "prod_cho": dict(lmax_power_iters=0, cheb_degree=1,
                         coarse_solver="cholesky"),
        "prod_ns_mgl4": dict(lmax_power_iters=0, cheb_degree=1,
                             coarse_solver="ns", num_levels=4),
        "prod_ns_mgl6": dict(lmax_power_iters=0, cheb_degree=1,
                             coarse_solver="ns", num_levels=6),
        # reference-parity GS smoother on the production config
        # (incremental-residual multicolor sweeps, ~2 applies/sweep):
        # quantifies the GS-vs-Chebyshev per-step premium at scale
        "prod_gs": dict(lmax_power_iters=0, smoother="gs",
                        coarse_solver="ns"),
        # L1 as a TRANSFER level (restrict o fine-apply o prolong) instead
        # of cached-Ke: the phase profile measured l1_transfer_apply 6.6 ms
        # vs l1_cached_apply 7.5 ms + a 1.2 GB Ke stream + 22 ms l1_ke_build
        # per rebuild — and the flat fine kernel makes the embedded fine
        # apply cheaper still. 200 MB keeps L2+ (151 MB at 256-class) cached.
        "prod_kelim": dict(lmax_power_iters=0, cheb_degree=1,
                           coarse_solver="cholesky",
                           ke_cache_limit_bytes=200 * 2**20),
        # crash-isolation variants for the prod_gs TPU-worker fault
        # (first scan-timed attempt killed the worker): same GS smoother
        # with the Pallas fine apply disabled (pure-XLA applies), and
        # with the Cholesky coarsest solve instead of Newton-Schulz
        "prod_gs_xla": dict(lmax_power_iters=0, smoother="gs",
                            coarse_solver="ns", use_pallas=False),
        "prod_gs_cho": dict(lmax_power_iters=0, smoother="gs",
                            coarse_solver="cholesky"),
    }
    def _checkpoint_out():
        # Incremental write: a killed run (session death, TPU worker
        # crash) keeps every variant that finished instead of losing
        # the whole A/B (this exact failure lost the first lagrf run).
        if args.out:
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)

    for name in [v for v in args.variants.split(",") if v]:
        # "<base>_lagN": base variant + lagged preconditioner rebuilt
        # every N steps (multigrid.build_precond / oc_step precond=)
        lag = 0
        base_name = name
        m_lag = re.match(r"^(.*)_lag(\d+)$", name)
        if m_lag and m_lag.group(1) in VARIANTS:
            base_name, lag = m_lag.group(1), int(m_lag.group(2))
        kw = VARIANTS[base_name]
        _, prob_v, grid_v, _, top_v = build(args, settings_kw=kw)
        if args.scan > 0 and lag > 0:
            # Nested-scan lagged preconditioner: the OUTER scan body
            # builds the hierarchy leaves once and the INNER scan runs
            # `lag` OC steps against them as a loop-invariant. The
            # leaves never enter a scan carry — the first formulation
            # (carry + lax.cond rebuild) double-buffered the ~1.5 GB
            # leaf set (level-1 cached Ke alone is 1.2 GB at 256-class)
            # and died RESOURCE_EXHAUSTED on v5e 16 GB.
            n_blocks = max(1, args.scan // lag)
            K = n_blocks * lag
            solve_v = top_v.solve

            @jax.jit
            def run_k_lag(s):
                def block(s, _):
                    leaves = solve_v.build_precond(
                        top_v.physical_density(s.x))
                    def body(s, _):
                        s, m = topopt.oc_step(top_v, s, precond=leaves)
                        return s, (m["compliance"], m["cg_iters"])
                    return jax.lax.scan(body, s, None, length=lag)
                s, ms = jax.lax.scan(block, s, None, length=n_blocks)
                return s, jax.tree_util.tree_map(
                    lambda a: a.reshape((K,) + a.shape[2:]), ms)

            state_k, (cs, its) = run_k_lag(state)  # compile + warm
            _readback(cs)
            t0 = time.perf_counter()
            state_k, (cs, its) = run_k_lag(state_k)
            _readback(cs)
            sec = (time.perf_counter() - t0) / K
            its_np = np.asarray(its)
            results[f"variant_{name}"] = {
                "s": round(sec, 6), "scan": K, "lag": lag,
                "cg_iters": int(its_np[-1]),
                "cg_iters_max": int(its_np.max()),
                "compliance": round(2 * float(np.asarray(cs)[-1]), 4),
            }
            print(f"{'variant_' + name:24s} {sec * 1e3:10.2f} ms/step "
                  f"(scan {K}, cg last {int(its_np[-1])} "
                  f"max {int(its_np.max())})", flush=True)
            _checkpoint_out()
        elif args.scan > 0:
            # device-side loop: one dispatch runs `scan` full OC steps,
            # so per-dispatch tunnel latency (~100 ms at 4M voxels, and
            # variable) amortizes away instead of polluting the per-step
            # number — this matches sustained driver throughput.
            # The variant starts from the BASE config's warm state (the
            # OC state does not depend on solver settings) and the first
            # run_k call doubles as its 30-step warm — a per-variant
            # host warm loop costs ~10 min of dispatch overhead through
            # a degraded tunnel.
            K = args.scan

            @jax.jit
            def run_k(s):
                def body(s, _):
                    s, m = topopt.oc_step(top_v, s)
                    return s, (m["compliance"], m["cg_iters"])
                return jax.lax.scan(body, s, None, length=K)

            state_k, (cs, its) = run_k(state)  # compile + warm
            _readback(cs)
            t0 = time.perf_counter()
            state_k, (cs, its) = run_k(state_k)
            _readback(cs)
            sec = (time.perf_counter() - t0) / K
            results[f"variant_{name}"] = {
                "s": round(sec, 6), "scan": K,
                "cg_iters": int(np.asarray(its)[-1]),
                "compliance": round(2 * float(np.asarray(cs)[-1]), 4),
            }
            print(f"{'variant_' + name:24s} {sec * 1e3:10.2f} ms/step "
                  f"(scan {K}, cg {int(np.asarray(its)[-1])})", flush=True)
            _checkpoint_out()
        else:
            state_v, step_v, metrics_v = warm_state(
                top_v, cfg, grid_v, prob_v, args.warm)
            sec = timeit(step_v, (state_v,), max(args.reps // 2, 5),
                         f"variant_{name}", results)
            results[f"variant_{name}"].update({
                "cg_iters": int(metrics_v["cg_iters"]),
                "compliance": round(2 * float(metrics_v["compliance"]), 4),
            })
            _checkpoint_out()

    print(json.dumps(results, indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
