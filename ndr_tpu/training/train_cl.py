"""Continual-learning neural-TO driver (multi-headed MLP, per-task sigma).

Composes the reference's continual-learning building blocks into a
runnable experiment — the reference ships the pieces (MultiHeadedMLP +
per-task sigma rescaling, networks.py:264-323; task schedules,
training/cl_utils.py:10-41; weight/activation forgetting,
multires_utils.py:142-206) but no driver; this is the composition its
code is written for: a sequence of *tasks*, each a frequency band
sigma_t of the Fourier embedding, trained one after another on the same
TO problem with a shared trunk and one head per task.

Per task t:
  * B is rescaled in place for sigma_t (``change_scale_value`` — divides
    out the previous scale, networks.py:300-308);
  * optionally a fixed random activation gate is drawn for the trunk
    (gated activations, networks.py:209-234) and/or a fraction of the
    trunk weights is re-initialized (``forget_weights``,
    multires_utils.py:142-180);
  * head t + trunk train jointly on the compliance objective with the
    usual volume-constraint satisfier (same loss as training/neural.py).

Usage:
    python -m ndr_tpu.training.train_cl --prob problems/2d/mbb_beam.json \
        --grid "[60, 20]" --iter 100 --task-interval 1.5 --task-end 3 \
        --sigma 1.0 --jid cl_test
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ndr_tpu import models
from ndr_tpu.fem import multigrid as mg
from ndr_tpu.fem import topopt
from ndr_tpu.fem.simulator import problem_from_config
from ndr_tpu.io.problem import ProblemConfig
from ndr_tpu.ops import volume as vol
from ndr_tpu.training import curriculum
from ndr_tpu.training.neural import NeuralTOConfig, get_mgrid


@dataclasses.dataclass
class CLConfig:
    """Continual-learning schedule on top of a NeuralTOConfig.

    ``sigma_t = ncfg.sigma + task_deltas[t]`` with the deltas from
    ``prepare_task_values`` (reference: cl_utils.py:10-41 — "an array of
    changes in task_values").
    """

    task_interval: float = 1.0
    task_start: int = 0
    task_end: int = 3
    task_order: str = "ctf"
    iters_per_task: int = 100
    # gated activations: fraction of each trunk layer's units zeroed for
    # the task (0 = off; reference: networks.py register_gated_activations)
    activation_gate_rate: float = 0.0
    # weight forgetting between tasks (0 = off; reference:
    # multires_utils.forget_weights)
    forget_rate: float = 0.0
    forget_mode: str = "orthogonal"


def train_cl(
    cfg: ProblemConfig,
    ncfg: NeuralTOConfig,
    clcfg: CLConfig,
    dims=None,
    log: Callable[[str], None] = lambda s: sys.stderr.write(s),
    log_every: int = 10,
    dtype=jnp.float32,
):
    """Sequential multi-task training. Returns (params, buffers,
    per_task_histories, aux)."""
    prob, grid = problem_from_config(cfg, dims=dims, dtype=dtype)
    task_deltas = curriculum.prepare_task_values(
        interval=clcfg.task_interval, start=clcfg.task_start,
        end=clcfg.task_end, order=clcfg.task_order,
    )
    sigmas = [float(ncfg.sigma + d) for d in task_deltas]
    n_tasks = len(sigmas)

    mlp_cfg = models.MLPConfig(
        in_features=grid.ndim, out_features=1,
        n_neurons=ncfg.n_neurons, n_layers=ncfg.n_layers,
        embedding_size=ncfg.embedding_size, scale=1.0,
    )
    key = jax.random.PRNGKey(ncfg.seed)
    key, k_init = jax.random.split(key)
    params, buffers = models.init_multihead_mlp(k_init, mlp_cfg, n_tasks, dtype)

    hard = vol.is_hard_mode(ncfg.volume_constraint_satisfier)
    coords = get_mgrid(grid.dims, dtype=dtype)
    max_volume = jnp.asarray(cfg.max_volume, dtype)

    settings = mg.MGSolverSettings(
        num_levels=ncfg.multigrid_levels, cg_iter=ncfg.cg_iter,
        tol=ncfg.cg_tol, mg_iterations=1, mg_smoothing_iterations=2,
        use_pallas=ncfg.use_pallas, full_multigrid=True, zero_init=False,
        smoother=ncfg.smoother,
    )
    solve = mg.make_mg_solver(prob, settings)
    optimizer = optax.adam(ncfg.learning_rate)

    def density(params, buffers, head, masks):
        out = models.multihead_apply(
            params, buffers, coords, head, mlp_cfg, activation_masks=masks
        )[..., 0]
        if hard:
            return vol.satisfy_volume_constraint(
                out, max_volume, mode=ncfg.volume_constraint_satisfier)
        return jnp.clip(jax.nn.sigmoid(out), 0.0, 1.0)

    def make_task_step(head: int, masks):
        def loss_fn(params, buffers, u0):
            rho = density(params, buffers, head, masks)
            u, iters = solve(jax.lax.stop_gradient(rho), u0)
            u = jax.lax.stop_gradient(u)
            c = 2.0 * topopt.compliance_with_adjoint(rho, u, prob)
            loss = c
            if not hard:
                loss = loss + vol.satisfy_volume_constraint(
                    rho, max_volume, compliance_loss=c,
                    mode=ncfg.volume_constraint_satisfier,
                    scaler_mode="clip", constant=ncfg.scaler_constant)
            return loss, (c, u, iters)

        @jax.jit
        def step(params, buffers, opt_state, u):
            (loss, (c, u, iters)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, buffers, u)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, u, {"loss": loss, "compliance": c,
                                          "cg_iters": iters}

        return step

    mixed = (settings.mixed_precision and dtype == jnp.float32
             and jax.config.jax_enable_x64)
    histories: List[List[float]] = []
    for t, sigma in enumerate(sigmas):
        log(f"CL task {t}: sigma={sigma}\n")
        buffers = models.change_scale_value(buffers, sigma)
        masks = None
        if clcfg.activation_gate_rate > 0:
            key, k = jax.random.split(key)
            masks = curriculum.make_activation_masks(
                k, params["trunk"], clcfg.activation_gate_rate)
        if t > 0 and clcfg.forget_rate > 0:
            key, k = jax.random.split(key)
            params = dict(params, trunk=curriculum.forget_weights(
                k, params["trunk"], clcfg.forget_rate, mode=clcfg.forget_mode,
                n_neurons=ncfg.n_neurons, embedding_size=ncfg.embedding_size))
        step = make_task_step(t, masks)
        # fresh optimizer state per task (new head enters the loss)
        opt_state = optimizer.init(params)
        u = jnp.zeros(prob.force.shape, jnp.float64 if mixed else dtype)
        hist = []
        t0 = time.perf_counter()
        for i in range(clcfg.iters_per_task):
            params, opt_state, u, metrics = step(params, buffers, opt_state, u)
            c = float(metrics["compliance"])
            hist.append(c)
            if i % log_every == 0 or i == clcfg.iters_per_task - 1:
                log(f"Task {t} step {i}: compliance {c:.6f}, "
                    f"cg_iters {int(metrics['cg_iters'])}\n")
        log(f"Task {t} runtime: {time.perf_counter() - t0:.2f}s\n")
        histories.append(hist)

    aux = dict(prob=prob, grid=grid, coords=coords, solve=solve,
               mlp_cfg=mlp_cfg, density=density, sigmas=sigmas)
    return params, buffers, histories, aux


def main(argv=None):
    import argparse
    import ast
    import json
    import os

    p = argparse.ArgumentParser()
    p.add_argument("--jid", default=None)
    p.add_argument("--grid", default=None)
    p.add_argument("--prob", required=True)
    p.add_argument("--v0", default=None)
    p.add_argument("--mgl", default=2, type=int)
    p.add_argument("--vcs", default="constrained_sigmoid")
    p.add_argument("--es", default=256, type=int)
    p.add_argument("--nn", default=256, type=int)
    p.add_argument("--nl", default=4, type=int)
    p.add_argument("--lr", default=3e-4, type=float)
    p.add_argument("--iter", default=100, type=int, help="iterations per task")
    p.add_argument("--sigma", default=1.0, type=float, help="base sigma")
    p.add_argument("--task-interval", default=1.0, type=float)
    p.add_argument("--task-start", default=0, type=int)
    p.add_argument("--task-end", default=3, type=int)
    p.add_argument("--task-order", default="ctf", choices=["ctf", "ftc", "random"])
    p.add_argument("--gate-rate", default=0.0, type=float)
    p.add_argument("--forget-rate", default=0.0, type=float)
    p.add_argument("--forget-mode", default="orthogonal")
    p.add_argument("--out", default="logs/cl")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--log-every", default=10, type=int)
    args = p.parse_args(argv)

    from ndr_tpu.utils.jax_setup import setup as jax_solver_setup
    jax_solver_setup()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ndr_tpu.io.problem import load_problem

    cfg = load_problem(args.prob)
    if args.v0 is not None:
        cfg = dataclasses.replace(cfg, max_volume=float(args.v0))
    import ast as _ast
    dims = tuple(_ast.literal_eval(args.grid)) if args.grid else cfg.grid_dims

    ncfg = NeuralTOConfig(
        embedding_size=args.es, n_neurons=args.nn, n_layers=args.nl,
        sigma=args.sigma, learning_rate=args.lr,
        volume_constraint_satisfier=args.vcs,
        multigrid_levels=args.mgl, seed=cfg.seed,
    )
    clcfg = CLConfig(
        task_interval=args.task_interval, task_start=args.task_start,
        task_end=args.task_end, task_order=args.task_order,
        iters_per_task=args.iter, activation_gate_rate=args.gate_rate,
        forget_rate=args.forget_rate, forget_mode=args.forget_mode,
    )
    np.random.seed(cfg.seed)
    params, buffers, histories, aux = train_cl(
        cfg, ncfg, clcfg, dims=dims, log_every=args.log_every)

    os.makedirs(args.out, exist_ok=True)
    title = args.jid or f"{cfg.name}_cl"
    # per-task final density fields + history
    from ndr_tpu.io import export

    grid = aux["grid"]
    for t in range(len(histories)):
        # re-evaluate each task's field at its own sigma
        buffers_t = models.change_scale_value(buffers, aux["sigmas"][t])
        rho = np.asarray(aux["density"](params, buffers_t, t, None))
        np.save(os.path.join(args.out, f"{title}_task{t}_densities.npy"), rho)
        export.write_vtr(
            os.path.join(args.out, f"{title}_task{t}"), {"density": rho},
            spacing=tuple(grid.stretchings) + (1.0,) * (3 - grid.ndim))
    with open(os.path.join(args.out, f"{title}_history.json"), "w") as f:
        json.dump({"histories": histories, "sigmas": aux["sigmas"]}, f)


if __name__ == "__main__":
    main()
