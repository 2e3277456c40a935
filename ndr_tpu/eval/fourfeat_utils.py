"""Fourier-feature interpolation studies (reference: fourfeat_utils.py).

Two studies:
  * :func:`compare_interpolation` — train an FF-MLP on a coarse image and
    compare its super-resolution PSNR against nearest / bilinear / bicubic
    upsampling (reference: fourfeat_utils.py:24-88; uses a local image
    array instead of a URL — this environment has no egress).
  * :func:`interpolate_coarse_to_fine` — bilinearly upsample a coarse
    density field to a finer grid and re-evaluate its compliance on a
    fresh simulator (reference: fourfeat_utils.py:91-148).
"""

from __future__ import annotations

import sys
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ndr_tpu import models
from ndr_tpu.eval.evaluate import evaluate_density, upsample_density
from ndr_tpu.io.problem import ProblemConfig
from ndr_tpu.training.neural import get_mgrid


def mse(y1, y2):
    return 0.5 * jnp.mean((y1 - y2) ** 2)


def psnr(y1, y2):
    """(reference: fourfeat_utils.py:63-64 — -10 log10(2 * mse))"""
    return -10.0 * jnp.log10(2.0 * mse(y1, y2))


def compare_interpolation(
    image: np.ndarray,
    scale_factor: int = 2,
    sigma: float = 10.0,
    steps: int = 2000,
    lr: float = 1e-4,
    log=lambda s: sys.stderr.write(s),
) -> Dict[str, float]:
    """Train an FF-MLP on the subsampled image, query at full resolution,
    and report PSNR against classical interpolation baselines.

    Returns {"fourfeat": psnr, "nearest": psnr, "linear": psnr,
    "cubic": psnr}.
    """
    img = jnp.asarray(image, jnp.float32)
    if img.ndim == 2:
        img = img[..., None]
    coarse = img[::scale_factor, ::scale_factor]

    cfg = models.MLPConfig(
        in_features=2, out_features=img.shape[-1], n_neurons=256, n_layers=4,
        embedding_size=256, scale=sigma, output_activation="sigmoid",
    )
    params, buffers = models.init_mlp(jax.random.PRNGKey(0), cfg)
    coords = get_mgrid(coarse.shape[:2])
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = models.mlp_apply(p, buffers, coords, cfg)
            return mse(pred, coarse)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        if i % max(steps // 10, 1) == 0:
            log(f"fourfeat fit step {i}: loss {float(loss):.3e}\n")

    coords_fine = get_mgrid(img.shape[:2])
    pred = models.mlp_apply(params, buffers, coords_fine, cfg)
    results = {"fourfeat": float(psnr(pred, img))}
    for mode in ("nearest", "linear", "cubic"):
        up = jax.image.resize(coarse, img.shape, method=mode)
        results[mode] = float(psnr(up, img))
    for k, v in results.items():
        log(f"{k}: psnr {v:.3f}\n")
    return results


def interpolate_coarse_to_fine(
    coarse_density,
    cfg: ProblemConfig,
    size: Sequence[int],
    log=lambda s: sys.stderr.write(s),
):
    """Upsample a coarse density field and re-evaluate compliance + binary
    compliance at the finer resolution (reference:
    fourfeat_utils.interpolate_coarse_to_fine)."""
    fine = upsample_density(jnp.asarray(coarse_density), tuple(size))
    result = evaluate_density(cfg, np.asarray(fine), dims=tuple(size))
    log(
        f"bilinear | Compliance after interpolation to {list(size)}: "
        f"{result.compliance}\n"
    )
    return result
