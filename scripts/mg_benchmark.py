"""MG accuracy/cost envelope sweep (reference: VoxelFEM/python/
MGBenchmark.ipynb cells 8-14).

Methodology: for a set of density fields on a 3D cantilever, compute a
"ground truth" displacement at a tight tolerance, then sweep
E_min x cg_tol x {zero-init, warm-start}, recording displacement error,
compliance error, and CG iteration counts. This defines the accuracy/cost
envelope the TPU MGPCG must (and does) reproduce.

Usage: python scripts/mg_benchmark.py [--dims "[64,32,32]"] [--fields 10]
Outputs a JSON table to stdout.
"""

import argparse
import ast
import dataclasses
import json
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dims", default="[64,32,32]")
    p.add_argument("--fields", default=10, type=int)
    p.add_argument("--levels", default=3, type=int)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--pallas", default="auto", choices=["auto", "on", "off"],
                   help="force the fused Pallas stiffness apply (auto "
                        "disables it below 2^17 elements, so the 64x32x32 "
                        "production-config device sweep needs 'on')")
    p.add_argument("--refined", action="store_true",
                   help="run the sweep solves through the PRODUCTION "
                        "mixed-precision path (fp32 MGPCG inside float64 "
                        "iterative refinement; enables x64). Ground truth "
                        "stays the tight-tol solve.")
    args = p.parse_args()

    import jax
    if args.refined:
        jax.config.update("jax_enable_x64", True)
    from ndr_tpu.utils.jax_setup import setup
    setup()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ndr_tpu.fem import multigrid as mg
    from ndr_tpu.fem.simulator import problem_from_config
    from ndr_tpu.io.problem import load_problem
    from ndr_tpu.ops import filters as flt

    dims = tuple(ast.literal_eval(args.dims))
    cfg = load_problem("problems/3d/cantilever_flexion.json")

    rng = np.random.default_rng(0)
    # structured random density fields (smoothed salt-and-pepper, like a
    # mid-optimization state)
    smoother = flt.SmoothingFilter(radius=2)
    fields = [
        np.asarray(
            smoother.apply(
                jnp.asarray(np.where(rng.uniform(size=dims) < 0.5, 0.05, 1.0))
            )
        )
        for _ in range(args.fields)
    ]

    results = []
    for emin in (1e-2, 1e-4, 1e-6):
        prob, grid = problem_from_config(cfg, dims=dims, dtype=jnp.float32)
        prob = dataclasses.replace(prob, Emin=emin)

        # ground truth at tight tolerance
        pallas = {"auto": "auto", "on": True, "off": False}[args.pallas]
        st_ref = mg.MGSolverSettings(num_levels=args.levels, cg_iter=400,
                                     tol=1e-9, smoother="chebyshev",
                                     use_pallas=pallas)
        solve_ref = jax.jit(mg.make_mg_solver(prob, st_ref))

        # ground truth once per (Emin, field) — the 6 (tol, warm) sweep
        # configs below reuse it (the 100-field device sweep would
        # otherwise re-run 1800 tol=1e-9 reference solves)
        u_refs, c_refs = [], []
        for f in fields:
            rho = jnp.asarray(f, jnp.float32)
            u_ref, _ = solve_ref(rho, None)
            u_refs.append(u_ref)
            c_refs.append(float(jnp.vdot(prob.force.astype(u_ref.dtype),
                                         u_ref)))

        for tol in (1e-2, 1e-4, 1e-6):
            for warm in (False, True):
                st = mg.MGSolverSettings(
                    num_levels=args.levels, cg_iter=400, tol=tol,
                    smoother="chebyshev", zero_init=not warm,
                    use_pallas=pallas,
                    mixed_precision=args.refined,
                )
                solve = jax.jit(mg.make_mg_solver(prob, st))
                u_errs, c_errs, iters_all = [], [], []
                u_prev = None
                for f, u_ref, c_ref in zip(fields, u_refs, c_refs):
                    rho = jnp.asarray(f, jnp.float32)
                    u, it = solve(rho, u_prev if warm else None)
                    if warm:
                        u_prev = u
                    c = float(jnp.vdot(prob.force.astype(u.dtype), u))
                    u_errs.append(
                        float(jnp.linalg.norm((u - u_ref).reshape(-1))
                              / jnp.linalg.norm(u_ref.reshape(-1)))
                    )
                    c_errs.append(abs(c - c_ref) / abs(c_ref))
                    iters_all.append(int(it))
                results.append({
                    "Emin": emin, "tol": tol, "warm": warm,
                    "u_err_mean": float(np.mean(u_errs)),
                    "c_err_mean": float(np.mean(c_errs)),
                    "cg_iters_mean": float(np.mean(iters_all)),
                })
                print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"table": results}))


if __name__ == "__main__":
    main()
