"""Evaluation library: query trained fields at arbitrary resolution.

(reference: eval/eval_fourfeat.py — load checkpoint, query the network at
a test resolution that may exceed the training resolution, re-evaluate
compliance + binary compliance on a fresh simulator; and
eval/eval_voxelfem.py — load saved densities, optional bilinear upsample,
re-evaluate.)
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ndr_tpu import models
from ndr_tpu.fem import multigrid as mg
from ndr_tpu.fem import topopt
from ndr_tpu.fem.simulator import problem_from_config
from ndr_tpu.io.problem import ProblemConfig
from ndr_tpu.ops import volume as vol
from ndr_tpu.training.neural import get_mgrid


@dataclasses.dataclass
class EvalResult:
    compliance: float
    binary_compliance: float
    binary_volume: float
    density: np.ndarray


def make_compliance_evaluator(
    cfg: ProblemConfig,
    dims,
    multigrid_levels: int = 1,
    tol: float = 1e-7,
    mg_iterations: int = 2,
    smoother: str = "gs",
    dtype=None,
):
    """Fresh simulator + solver at the test resolution.

    Defaults mirror eval_fourfeat.py:148-152 (mgl=1, tol=1e-7,
    mgIterations=2). On a TPU backend the default dtype is float32 (the
    mixed-precision refinement delivers f64-grade residuals; a plain
    float64 solve would run on emulated arithmetic); elsewhere float64.
    """
    if dtype is None:
        try:
            d = jax.devices()[0]
            on_tpu = "tpu" in f"{d.platform} {d.device_kind}".lower()
        except Exception:
            on_tpu = False
        dtype = jnp.float32 if on_tpu else None
    prob, grid = problem_from_config(cfg, dims=dims, dtype=dtype)
    settings = mg.MGSolverSettings(
        num_levels=multigrid_levels, cg_iter=200, tol=tol,
        mg_iterations=mg_iterations, smoother=smoother,
    )
    solve = mg.make_mg_solver(prob, settings)

    @jax.jit
    def compliance(rho):
        u, iters = solve(rho, None)
        return 2.0 * topopt.compliance_with_adjoint(rho, u, prob), iters

    return prob, grid, compliance


def evaluate_density(cfg, density, dims=None, **solver_kwargs) -> EvalResult:
    """Compliance + binary compliance of a density field
    (reference: utils.compute_binary_compliance_loss + eval_voxelfem.py)."""
    density = np.asarray(density)
    dims = dims or density.shape
    prob, grid, compliance = make_compliance_evaluator(cfg, dims, **solver_kwargs)
    rho = jnp.asarray(density, prob.force.dtype)
    c, _ = compliance(rho)
    binary = (rho > 0.5).astype(rho.dtype)
    cb, _ = compliance(binary)
    return EvalResult(
        compliance=float(c),
        binary_compliance=float(cb),
        binary_volume=float(jnp.mean(binary)),
        density=density,
    )


def evaluate_model_at_resolution(
    cfg: ProblemConfig,
    params,
    buffers,
    mlp_cfg: models.MLPConfig,
    test_dims,
    volume_constraint_satisfier: str = "constrained_sigmoid",
    **solver_kwargs,
) -> EvalResult:
    """Query the neural field at an arbitrary (often higher) resolution —
    the paper's mesh-independence evaluation (eval_fourfeat.py:100-133)."""
    prob, grid, compliance = make_compliance_evaluator(cfg, test_dims, **solver_kwargs)
    coords = get_mgrid(grid.dims, dtype=prob.force.dtype)
    # chunked: the full-grid Fourier embedding is (N, 2*embed) — 34 GB at
    # a 4.2M-voxel test resolution with 1024 features
    out = models.mlp_apply_chunked(params, buffers, coords, mlp_cfg)[..., 0]
    if vol.is_hard_mode(volume_constraint_satisfier):
        rho = vol.satisfy_volume_constraint(
            out, cfg.max_volume, mode=volume_constraint_satisfier
        )
    else:
        rho = jnp.clip(out, 0.0, 1.0)
    c, _ = compliance(rho)
    binary = (rho > 0.5).astype(rho.dtype)
    cb, _ = compliance(binary)
    return EvalResult(
        compliance=float(c),
        binary_compliance=float(cb),
        binary_volume=float(jnp.mean(binary)),
        density=np.asarray(rho),
    )


def upsample_density(density: jnp.ndarray, new_dims) -> jnp.ndarray:
    """Bilinear/trilinear density upsampling for resolution transfer of
    raw voxel fields (reference: eval_voxelfem.py upsample path +
    fourfeat_utils.interpolate_coarse_to_fine)."""
    return jax.image.resize(density, tuple(new_dims), method="linear")
