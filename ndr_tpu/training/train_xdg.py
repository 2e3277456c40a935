"""Neural-TO CLI driver (reference: training/train_xdg.py).

Example:
    python -m ndr_tpu.training.train_xdg --prob problems/3d/bridge.json \
        --grid "[64, 32, 16]" --v0 0.4 --mgl 2 --sigma 1.0 --iter 100 \
        --vcs maxed_barrier --jid test
"""

from __future__ import annotations

import argparse
import ast
import dataclasses
import json
import os
import sys

import numpy as np

from ndr_tpu.io import export
from ndr_tpu.io.problem import load_problem
from ndr_tpu.training import curriculum
from ndr_tpu.training.neural import NeuralTOConfig, train
from ndr_tpu.utils import checkpoint as ckpt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--jid", default=None, help="experiment id for output names")
    p.add_argument("--grid", default=None, help='grid dims e.g. "[40, 20, 10]"')
    p.add_argument("--prob", required=True, help="problem JSON")
    p.add_argument("--v0", default=None, help="volume fraction")
    p.add_argument("--mgl", default=2, type=int, help="multigrid levels")
    p.add_argument("--vcs", default="maxed_barrier", help="volume constraint satisfier")
    p.add_argument("--checkpoint", default=None, help="resume checkpoint path")
    p.add_argument("--es", default=1024, type=int, help="Fourier embedding size")
    p.add_argument("--nn", default=512, type=int, help="hidden width")
    p.add_argument("--nl", default=4, type=int, help="hidden layers")
    p.add_argument("--lr", default=3e-4, type=float)
    p.add_argument("--iter", default=5000, type=int)
    p.add_argument("--cs", default=100, type=int, help="checkpoints per run")
    p.add_argument("--sigma", default=1.0, type=float, help="Fourier feature scale")
    p.add_argument("--out", default="logs/ff")
    p.add_argument("--x64", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--log-every", default=10, type=int)
    p.add_argument("--pallas", default="auto", choices=["auto", "on", "off"],
                   help="fused Pallas stiffness apply in the MG solve")
    p.add_argument("--smoother", default="chebyshev", choices=["chebyshev", "gs"],
                   help="MG smoother: chebyshev (TPU-fast) or gs (reference parity)")
    p.add_argument("--cheb-degree", default=2, type=int,
                   help="Chebyshev polynomial degree per smoothing iteration")
    p.add_argument("--mlp-precision", default=None,
                   choices=["default", "high", "highest"],
                   help="hidden-layer matmul precision of the MLP "
                        "(default: NeuralTOConfig's)")
    p.add_argument("--scan", default=0, type=int,
                   help="device-side chunked loop: run this many training "
                        "steps per dispatch as a lax.scan (amortizes the "
                        "per-step host sync + tunnel latency). Static-"
                        "filter runs only; ignored when --af is set. "
                        "Checkpoints land on chunk boundaries.")
    p.add_argument("--precond-lag", default=0, type=int,
                   help="rebuild the MG preconditioner hierarchy every N "
                        "training steps instead of every step (the CG "
                        "operator stays exact; fine-level smoother state "
                        "refreshes every solve). Static-filter runs only.")
    # multiresolution curriculum (reference: train_xdg.py:119 + :234-238 —
    # the shipped config is single-resolution: interval=0, start=0, end=1,
    # order='ftc', repeat 1; these flags expose the full loop)
    p.add_argument("--res-interval", default=0, type=int,
                   help="grid-size delta between multires resolutions")
    p.add_argument("--res-start", default=0, type=int)
    p.add_argument("--res-end", default=1, type=int)
    p.add_argument("--res-order", default="ftc", choices=["ctf", "ftc", "random"])
    p.add_argument("--repeat-res", default=1, type=int)
    p.add_argument("--epoch-mode", default="constant",
                   choices=["constant", "linear_inc", "linear_dec",
                            "linear_abs", "random"],
                   help="per-resolution iteration schedule (constant uses --iter)")
    p.add_argument("--epoch-start", default=800, type=int)
    p.add_argument("--epoch-end", default=1500, type=int)
    # adaptive filtering (reference: train_xdg.py:86-101 config dict +
    # filtering.py:145-199; applied after the volume satisfier each step).
    # "--af auto" reads the problem JSON's adaptive_filtering list
    # [beta_interval, beta_scaler, radius_interval, radius_scaler,
    #  sigma_interval, sigma_scaler]; "--af off" disables (the reference's
    # shipped default); an explicit JSON dict sets any AdaptiveFilterState
    # field, e.g. '{"use_projection": true, "beta_interval": 50,
    # "beta_scaler": 1.1}'.
    p.add_argument("--af", default="off",
                   help='adaptive filtering: "off", "auto", or a JSON dict')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    # solver runtime setup: persistent compile cache, true-fp32 matmuls,
    # x64 mode for the float64 iterative-refinement residuals. Without
    # this the fp32 CG stalls at its rounding noise floor once the design
    # hardens (tol 1e-4 unreachable), pinning every solve at the cg_iter
    # cap — the round-1 "neural throughput decays 10x" failure mode.
    from ndr_tpu.utils.jax_setup import setup as jax_solver_setup
    jax_solver_setup()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    dtype = jnp.float64 if args.x64 else jnp.float32

    cfg = load_problem(args.prob)
    if args.v0 is not None:
        cfg = dataclasses.replace(cfg, max_volume=float(args.v0))
    dims = tuple(ast.literal_eval(args.grid)) if args.grid else cfg.grid_dims

    ncfg = NeuralTOConfig(
        embedding_size=args.es, n_neurons=args.nn, n_layers=args.nl,
        sigma=args.sigma, learning_rate=args.lr,
        volume_constraint_satisfier=args.vcs,
        multigrid_levels=args.mgl, seed=cfg.seed,
        use_pallas={"auto": "auto", "on": True, "off": False}[args.pallas],
        smoother=args.smoother,
        cheb_degree=args.cheb_degree,
        precond_lag=args.precond_lag,
        **({"matmul_precision": args.mlp_precision}
           if args.mlp_precision else {}),
    )

    np.random.seed(cfg.seed)
    os.makedirs(args.out, exist_ok=True)
    title = args.jid or f"{cfg.name}_s{args.sigma}"

    # adaptive-filtering schedule
    from ndr_tpu.ops.filters import AdaptiveFilterState

    filters = None
    filters_init = {}
    if args.af == "auto" and cfg.adaptive_filtering:
        af = list(cfg.adaptive_filtering) + [1.0] * 6
        filters = AdaptiveFilterState(
            use_projection=True, beta_interval=af[0], beta_scaler=af[1],
            use_smoothing=True, radius_interval=af[2], radius_scaler=af[3],
            use_gaussian=False, sigma_interval=af[4], sigma_scaler=af[5],
        )
    elif args.af not in ("off", "auto"):
        fields = json.loads(args.af)
        filters = AdaptiveFilterState(**fields)
        filters_init = {k[: -len("_init")] if k.endswith("_init") else k: v
                        for k, v in fields.items()
                        if k in ("beta", "radius", "sigma")}
    if filters is not None:
        sys.stderr.write(f"adaptive filtering configs: {filters}\n")

    ckp_step = max(args.iter // args.cs, 1)

    def checkpoint_cb(i, state):
        if (i + 1) % ckp_step == 0:
            # async: the training loop pays only the dispatch, not the
            # bulk device->host transfer + disk write
            ckpt.save_checkpoint_async(
                os.path.join(args.out, f"{title}_iter{i}.npz"),
                state.params, state.buffers, ncfg.sigma,
                step=int(state.step), opt_state=state.opt_state,
            )

    # resume from a previous checkpoint if requested
    # (reference: train_xdg.py --checkpoint -> utils.load_weights)
    resume_state = None
    if args.checkpoint:
        from ndr_tpu.training.neural import build_trainer

        state0, _, _ = build_trainer(cfg, ncfg, dims=dims, dtype=dtype)
        params, buffers, sigma, step, opt_state = ckpt.load_checkpoint(
            args.checkpoint, state0.params, state0.buffers, state0.opt_state
        )
        import dataclasses as _dc
        resume_state = _dc.replace(
            state0, params=params, buffers=buffers,
            opt_state=opt_state or state0.opt_state,
            step=jnp.asarray(step or 0, jnp.int32),
        )
        sys.stderr.write(f"Resumed checkpoint at step {step} (sigma={sigma})\n")

    multires = args.res_interval != 0 or args.res_end > 1 or args.repeat_res > 1
    if multires:
        if resume_state is not None:
            raise SystemExit("--checkpoint resume is single-resolution only")
        deltas = curriculum.prepare_resolutions(
            interval=args.res_interval, start=args.res_start,
            end=args.res_end, order=args.res_order,
            repeat_res=args.repeat_res,
        )
        if args.res_order == "ftc":
            deltas = deltas[:-1]  # reference: train_xdg.py:119 drops the tail
        epoch_sizes = curriculum.prepare_epoch_sizes(
            n_resolutions=len(deltas), start=args.epoch_start,
            end=args.epoch_end, mode=args.epoch_mode,
            constant_value=args.iter,
        )
        from ndr_tpu.training.neural import train_multires

        state, history, aux = train_multires(
            cfg, ncfg, dims, deltas, epoch_sizes,
            log_every=args.log_every, filters=filters,
            filters_init=filters_init, checkpoint_cb=checkpoint_cb,
            dtype=dtype, scan_chunk=args.scan,
        )
    else:
        state, history, aux = train(
            cfg, ncfg, dims=dims, max_iter=args.iter,
            log_every=args.log_every, checkpoint_cb=checkpoint_cb,
            state=resume_state, filters=filters, dtype=dtype,
            scan_chunk=args.scan,
        )

    # final artifacts: density field + history + final checkpoint
    coords = aux["coords"]
    rho = np.asarray(
        aux["density_fn"](state.params, state.buffers, coords,
                          jnp.asarray(cfg.max_volume, dtype))
    )
    np.save(os.path.join(args.out, f"{title}_densities.npy"), rho)
    grid = aux["grid"]
    export.write_vtr(
        os.path.join(args.out, title), {"density": rho},
        spacing=tuple(grid.stretchings) + (1.0,) * (3 - grid.ndim),
    )
    ckpt.wait_checkpoints()
    ckpt.save_checkpoint(
        os.path.join(args.out, f"{title}.npz"),
        state.params, state.buffers, ncfg.sigma,
        step=int(state.step), opt_state=state.opt_state,
    )
    # final compliance + thresholded binary compliance report
    # (reference: train_xdg.py final max-resolution query + binary loss).
    # One jitted single-solve program called twice (soft then binary):
    # fusing both solves into one XLA program doubled the live working
    # set on top of the training state and crashed the TPU worker at
    # multi-million-voxel grids.
    from ndr_tpu.fem import topopt as _topo

    state = dataclasses.replace(state, opt_state=None, u=None)

    @jax.jit
    def eval_compliance(rho, p, masks):
        # prob/masks as operands (not inlined literals), as in the
        # training step
        u, _ = aux["solve"](rho, None, prob=p, masks=masks)
        return 2.0 * _topo.compliance_with_adjoint(rho, u, p)

    masks_fe = tuple(jnp.asarray(lev.dirichlet_mask)
                     for lev in aux["solve"].cfg.levels)
    rho_j = jnp.asarray(rho, dtype)
    c_final = float(eval_compliance(rho_j, aux["prob"], masks_fe))
    binary = (rho_j > 0.5).astype(dtype)
    b_vol = float(jnp.mean(binary))
    c_binary = float(eval_compliance(binary, aux["prob"], masks_fe))
    sys.stderr.write(
        f"Final compliance {c_final:.6f}, binary {c_binary:.6f}, "
        f"b-vol={b_vol:.7f}\n"
    )
    with open(os.path.join(args.out, f"{title}_history.json"), "w") as f:
        json.dump({
            "history": history,
            "final_compliance": c_final,
            "binary_compliance": c_binary,
        }, f)


if __name__ == "__main__":
    main()
