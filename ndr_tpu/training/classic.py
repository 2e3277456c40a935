"""Classic SIMP topology optimization (the reference's ground-truth path).

Library equivalent of ``fem.ground_truth_topopt`` (reference:
fem.py:20-106) + the ``training/train_voxelfem.py`` driver: smoothing +
projection filters, total-volume constraint, MGPCG compliance objective
(tol=1e-4, FMG, 1 MG iteration, 2 smoothing sweeps, warm-started), OC
optimizer — the whole OC step compiled into one jitted TPU program.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ndr_tpu.fem import multigrid as mg
from ndr_tpu.fem import topopt
from ndr_tpu.fem.simulator import problem_from_config
from ndr_tpu.io.problem import ProblemConfig, load_problem
from ndr_tpu.ops import filters as flt
from ndr_tpu.utils import timers


@dataclasses.dataclass
class ClassicResult:
    densities: np.ndarray          # final *design* variables
    physical: np.ndarray           # final filtered densities
    compliance: float              # 2 * (1/2 f^T u), the reference's loss convention
    binary_compliance: float
    history: List[float]
    seconds: float


def ground_truth_topopt(
    cfg: ProblemConfig,
    dims=None,
    max_iter: int = 100,
    multigrid_levels: int = 2,
    use_multigrid: bool = True,
    tol: float = 1e-4,
    smoother: str = "chebyshev",
    use_pallas="auto",
    smoothing_radius: int = 1,
    projection_beta: float = 1.0,
    oc_move: float = 0.2,
    oc_ctol: float = 1e-6,
    cg_iter: Optional[int] = None,
    optimizer: str = "OC",
    init: Optional[np.ndarray] = None,
    log: Callable[[str], None] = lambda s: sys.stderr.write(s),
    log_every: int = 1,
    callback=None,
    snapshot_cb=None,
    dtype=None,
    shards: int = 0,
    precond_lag: int = 0,
    scan_chunk: int = 0,
) -> ClassicResult:
    """Run classic SIMP TO with the OC optimizer.

    Matches the reference configuration (fem.py:34-87): filter chain
    [SmoothingFilter, ProjectionFilter], uniform init at maxVolume, MGPCG
    tol=1e-4 / FMG / mgIterations=1 / 2 smoothing sweeps / warm start.
    """
    # default: fp32 hot path with float64 refined equilibrium (fast on TPU)
    dtype = dtype or jnp.float32
    # mgl=0 means the plain-CG exact-solve path (reference's direct solve)
    use_multigrid = use_multigrid and multigrid_levels > 0
    prob, grid = problem_from_config(cfg, dims=dims, dtype=dtype)
    filters = [
        flt.SmoothingFilter(radius=smoothing_radius),
        flt.ProjectionFilter(beta=projection_beta),
    ]
    mixed = False
    shards_2d = (tuple(shards) if isinstance(shards, (tuple, list))
                 else None)
    if shards_2d and (shards_2d[0] * shards_2d[1] > 1):
        # 2-D pencil decomposition over a (nx, ny) device mesh
        # (parallel.mesh.make_sharded_solver_2d)
        from ndr_tpu.parallel import mesh as pmesh
        import jax as _jax

        nx, ny = shards_2d
        mixed = dtype == jnp.float32 and _jax.config.jax_enable_x64
        solve = pmesh.make_sharded_solver_2d(
            prob, nx, ny, num_levels=multigrid_levels,
            tol=tol, max_iter=cg_iter or 100,
            mixed_precision=mixed,
            use_pallas=mg.resolve_use_pallas(
                use_pallas, prob.grid.with_dims(
                    (prob.grid.dims[0] // nx, prob.grid.dims[1] // ny)
                    + prob.grid.dims[2:])),
        )
    elif shards and not shards_2d and shards > 1:
        # slab decomposition over a device mesh (parallel.mesh): the
        # sharded MGPCG with f64 refinement replaces the single-chip
        # solver; everything else (filters, OC, adjoint) is unchanged
        from ndr_tpu.parallel import mesh as pmesh
        import jax as _jax

        mixed = dtype == jnp.float32 and _jax.config.jax_enable_x64
        solve = pmesh.make_sharded_solver(
            prob, num_shards=shards, num_levels=multigrid_levels,
            tol=tol, max_iter=cg_iter or 100,
            mixed_precision=mixed,
            use_pallas=mg.resolve_use_pallas(
                use_pallas, prob.grid.with_dims(
                    (prob.grid.dims[0] // shards,) + prob.grid.dims[1:])),
        )
    elif use_multigrid:
        if cg_iter is None:
            # un-coarsenable grids (e.g. 2D bridge 250x125) degrade to
            # block-Jacobi PCG, which needs far more (much cheaper) iters
            cg_iter = (2000 if mg.max_feasible_coarsenings(grid) == 0
                       else 100)
        settings = mg.MGSolverSettings(
            num_levels=multigrid_levels,
            cg_iter=cg_iter,
            tol=tol,
            mg_iterations=1,
            mg_smoothing_iterations=2,
            full_multigrid=True,
            zero_init=False,
            smoother=smoother,
            # degree-2 Chebyshev polynomial per smoothing call (degree =
            # cheb_degree * mg_smoothing_iterations): the 256x128x128
            # on-device sweep measured 384.6 ms/step at cg_iters=2 vs
            # 431.6 at degree 4 / cg_iters=1 — the cheaper preconditioner
            # wins even paying one extra CG iteration
            # (logs/profile_oc_256_scan.json)
            cheb_degree=1,
            use_pallas=use_pallas,
        )
        solve = mg.make_mg_solver(prob, settings)
        import jax as _jax
        mixed = (
            settings.mixed_precision
            and dtype == jnp.float32
            and _jax.config.jax_enable_x64
        )
    else:
        def solve(rho, u0):
            return topopt.solve_displacement_cg(prob, rho, u0, tol=tol, max_iter=10000)

    top = topopt.TopologyOptimizationProblem(
        prob=prob, filters=filters, max_volume=cfg.max_volume, solve=solve
    )

    x0 = jnp.full(grid.dims, cfg.max_volume, dtype=dtype)
    if init is not None:
        x0 = jnp.asarray(init, dtype=dtype).reshape(grid.dims)
    state = topopt.oc_init(top, x0, u_dtype=jnp.float64 if mixed else dtype)

    history: List[float] = []
    t_start = time.perf_counter()
    if optimizer == "LBFGS":
        # reference: fem.py:89-95 — IPOPT limited-memory BFGS alternative
        # to OC; here the native projected L-BFGS (ops/lbfgs.py)
        from ndr_tpu.ops import lbfgs as _lbfgs

        with timers.section("LBFGS optimization"):
            res = _lbfgs.lbfgs_topopt(
                top, x0, max_iter=max_iter, log=log, log_every=log_every
            )
        # res.history already carries the doubled (f^T u) convention
        history = list(res.history)
        state = dataclasses.replace(state, x=jnp.asarray(res.x))
    else:
        # donate the state: x/physical fields alias in place, halving
        # peak HBM for the two large per-voxel buffers at 4M+ voxels.
        # The problem arrays (force, per-level Dirichlet masks) are jit
        # OPERANDS, not closure constants: inlined they are ~40-65 MB of
        # StableHLO literals per traced module at 4M voxels.
        if hasattr(solve, "cfg"):
            masks_op = tuple(jnp.asarray(lev.dirichlet_mask)
                             for lev in solve.cfg.levels)

            def _step_fn(p, masks, s, leaves=None):
                t = dataclasses.replace(
                    top, prob=p,
                    solve=lambda rho, u0=None, precond=None: solve(
                        rho, u0, prob=p, masks=masks, precond=precond))
                return topopt.oc_step(t, s, m=oc_move, ctol=oc_ctol,
                                      precond=leaves)

            _step = jax.jit(_step_fn, donate_argnums=2)

            use_lag = precond_lag > 1 and hasattr(solve, "build_precond")
            if use_lag:
                # Lagged preconditioner (multigrid.build_precond): the
                # Galerkin hierarchy + coarsest factor only shape the
                # preconditioner, so rebuild them every `precond_lag`
                # steps — or early, when a cg_iters jump says the stale
                # hierarchy stopped paying for itself. The CG operator
                # always uses the current density (see mgpcg_solve).
                _build = jax.jit(
                    lambda p, masks, x: solve.build_precond(
                        top.physical_density(x), prob=p, masks=masks))
                lag_state = {"leaves": None, "age": 0, "it_ref": None}

                def step(s, _ls=lag_state):
                    if _ls["leaves"] is None or _ls["age"] >= precond_lag:
                        _ls["leaves"] = _build(prob, masks_op, s.x)
                        _ls["age"], _ls["it_ref"] = 0, None
                    s, m = _step(prob, masks_op, s, _ls["leaves"])
                    _ls["age"] += 1
                    it = int(m["cg_iters"])
                    if _ls["it_ref"] is None:
                        _ls["it_ref"] = it
                    elif it > _ls["it_ref"] + 4:
                        _ls["age"] = precond_lag  # force rebuild next step
                    return s, m
            else:
                def step(s):
                    return _step(prob, masks_op, s)
        else:
            step = jax.jit(
                lambda s: topopt.oc_step(top, s, m=oc_move, ctol=oc_ctol),
                donate_argnums=0)

        # Device-side chunked loop (--scan): one dispatch runs
        # `scan_chunk` OC steps as a lax.scan, so the ~0.1-0.2 s
        # per-dispatch latency through the axon tunnel amortizes away
        # (round-2 c256_full.log: 0.56 s/step host-looped vs 0.385
        # scan-timed for the same program). With precond_lag > 1 the
        # chunk is a nested scan — the outer body builds the hierarchy
        # leaves, the inner scan runs `lag` steps against them as a
        # loop-invariant (leaves must NOT ride a carry: double-buffering
        # the ~1.5 GB leaf set exhausts v5e HBM). The adaptive
        # rebuild-on-cg-jump escape hatch of the host-loop path cannot
        # run inside scan; the fixed lag relies on precond_refresh_fine
        # holding cg_iters flat (device A/B logs/profile_oc_256_lagrf.*).
        # snapshot_cb/callback only see chunk-boundary states.
        run_chunk = None
        chunk = 0
        if scan_chunk > 1 and hasattr(solve, "cfg"):
            _lag = precond_lag if (precond_lag > 1
                                   and hasattr(solve, "build_precond")) else 0
            chunk = (max(1, scan_chunk // _lag) * _lag if _lag
                     else scan_chunk)

            def _chunk_fn(p, masks, s):
                def body(s, leaves):
                    def one(s, _):
                        s, m = _step_fn(p, masks, s, leaves)
                        return s, (m["compliance"], m["constraint"],
                                   m["lambda"], m["cg_iters"])
                    return jax.lax.scan(one, s, None,
                                        length=_lag or chunk)
                if _lag:
                    def block(s, _):
                        leaves = solve.build_precond(
                            top.physical_density(s.x), prob=p, masks=masks)
                        return body(s, leaves)
                    s, ms = jax.lax.scan(block, s, None,
                                         length=chunk // _lag)
                    ms = jax.tree_util.tree_map(
                        lambda a: a.reshape((chunk,) + a.shape[2:]), ms)
                else:
                    s, ms = body(s, None)
                return s, ms

            run_chunk = jax.jit(_chunk_fn, donate_argnums=2)

        t_iter = t_start
        with timers.section("OC optimization"):
            idx = 0
            while run_chunk is not None and idx + chunk <= max_iter:
                state, ms = run_chunk(prob, masks_op, state)
                cs, cons, lams, its = (np.asarray(a) for a in ms)
                dt = (time.perf_counter() - t_iter) / chunk
                for j in range(chunk):
                    i = idx + j
                    history.append(2.0 * float(cs[j]))
                    if i % log_every == 0 or i == max_iter - 1:
                        log(
                            f"Total Steps: {i}, Runtime: {dt:.2f}, "
                            f"Compliance loss {2.0 * float(cs[j]):.6f}, "
                            f"constraint {float(cons[j]):.2e}, "
                            f"lambda {float(lams[j]):.4g}, "
                            f"cg_iters {int(its[j])}\n"
                        )
                idx += chunk
                t_iter = time.perf_counter()
                if callback is not None:
                    callback(idx - 1, state)
                if snapshot_cb is not None:
                    snapshot_cb(idx - 1, state,
                                lambda s=state: top.physical_density(s.x))
            for idx in range(idx, max_iter):
                state, metrics = step(state)
                c2 = 2.0 * float(metrics["compliance"])
                history.append(c2)
                if idx % log_every == 0 or idx == max_iter - 1:
                    dt = time.perf_counter() - t_iter
                    log(
                        f"Total Steps: {idx}, Runtime: {dt:.2f}, Compliance loss "
                        f"{c2:.6f}, constraint {float(metrics['constraint']):.2e}, "
                        f"lambda {float(metrics['lambda']):.4g}, "
                        f"cg_iters {int(metrics['cg_iters'])}\n"
                    )
                t_iter = time.perf_counter()
                if callback is not None:
                    callback(idx, state)
                if snapshot_cb is not None:
                    # lazy thunk: only computes the filtered field if the
                    # callback decides this step is a snapshot step
                    snapshot_cb(idx, state,
                                lambda s=state: top.physical_density(s.x))

    # Final evaluation + binary compliance, matching the reference's exact
    # (quirky) semantics (fem.py:99-106 + utils.compute_binary_compliance_loss
    # utils.py:328-337): both the binarized field AND the final "soft" field
    # are passed through top.setVars — i.e. re-run through the filter chain —
    # before the solve. The final soft number is therefore the compliance of
    # the *double-filtered* design (x0 there is tps.getDensities(), already
    # physical), and the binary number is of the *filtered* thresholded
    # physical field. The last OC trajectory value is the single-filtered one.
    @jax.jit
    def final_eval(p, masks, state):
        rho = top.physical_density(state.x)                 # physical (filtered)
        binary = (rho > 0.5).astype(dtype)
        if masks is not None:
            def solve_(r, u0):
                return solve(r, u0, prob=p, masks=masks)
        else:
            solve_ = solve
        # reference binary: setVars(binary) -> filter chain -> solve
        u_b, _ = solve_(top.physical_density(binary), state.u)
        c_binary = jnp.vdot(p.force.astype(u_b.dtype), u_b)
        # reference final soft: setVars(physical) -> filter chain -> solve
        u_s, _ = solve_(top.physical_density(rho), state.u)
        c_soft = jnp.vdot(p.force.astype(u_s.dtype), u_s)
        return rho, c_soft, binary, c_binary

    masks_fe = (tuple(jnp.asarray(lev.dirichlet_mask)
                      for lev in solve.cfg.levels)
                if hasattr(solve, "cfg") else None)
    rho, c_soft, binary, c_binary = final_eval(prob, masks_fe, state)
    c_binary = float(c_binary)

    seconds = time.perf_counter() - t_start
    log(
        f"Compliance loss of binary densities for \"{binary.size}\": "
        f"{c_binary}, b-vol={float(jnp.mean(binary)):.7f}\n"
    )
    log(
        f"Final step, Compliance loss {float(c_soft):.6f}, "
        f"Binary Compliance loss {c_binary:.6f}\n"
    )
    log(f"Overall runtime: {seconds:.3f}\n")
    return ClassicResult(
        densities=np.asarray(state.x),
        physical=np.asarray(rho),
        compliance=float(c_soft),
        binary_compliance=c_binary,
        history=history,
        seconds=seconds,
    )
