"""CNN density generators (secondary models).

:func:`init_cnn`/`cnn_apply` — the Google neural-structural-optimization
generator (reference: networks.py:395-600 CNNModel): latent vector ->
dense -> reshape (C, h, w) -> [tanh -> bilinear upsample -> global
normalization -> SAME-pad 5x5 conv -> learned AddOffset] per stage.

:func:`init_deconv_generator`/`deconv_generator_apply` — the small
GAN-style deconv generator (reference: networks.py:329-381).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CNNConfig:
    grid_dims: Tuple[int, int] = (40, 20)
    latent_size: int = 128
    dense_channels: int = 32
    resizes: Sequence[int] = (1, 2, 2, 2, 1)
    conv_filters: Sequence[int] = (128, 64, 32, 16, 1)
    offset_scale: float = 10.0
    kernel_size: Tuple[int, int] = (5, 5)
    dense_init_scale: float = 1.0

    @property
    def base_hw(self):
        total = int(np.prod(self.resizes))
        return self.grid_dims[0] // total, self.grid_dims[1] // total


def _same_pad(h, w, kh, kw):
    """TensorFlow SAME padding amounts (reference: networks.py:482-513)."""
    ph, pw = max(kh - 1, 0), max(kw - 1, 0)
    return (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)


def init_cnn(key, cfg: CNNConfig, dtype=jnp.float32):
    if len(cfg.resizes) != len(cfg.conv_filters):
        raise ValueError("resizes and filters must be same size")
    h, w = cfg.base_hw
    n_dense = h * w * cfg.dense_channels
    gain = cfg.dense_init_scale * float(np.sqrt(max(n_dense / cfg.latent_size, 1)))
    key, k = jax.random.split(key)
    dense = {
        "w": jax.nn.initializers.orthogonal(scale=gain)(k, (n_dense, cfg.latent_size), dtype),
        "b": jnp.zeros((n_dense,), dtype),
    }
    convs = []
    in_ch = cfg.dense_channels
    kh, kw = cfg.kernel_size
    for out_ch in cfg.conv_filters:
        key, k = jax.random.split(key)
        # He-normal fan_in (kaiming_normal, reference: networks.py:569-585)
        std = float(np.sqrt(2.0 / (in_ch * kh * kw)))
        W = std * jax.random.normal(k, (out_ch, in_ch, kh, kw), dtype)
        convs.append({"w": W, "b": jnp.zeros((out_ch,), dtype)})
        in_ch = out_ch

    # AddOffset biases: one per stage, shaped like that stage's conv output
    offsets = []
    ch, hh, ww = cfg.dense_channels, h, w
    for i, out_ch in enumerate(cfg.conv_filters):
        hh, ww = hh * cfg.resizes[i], ww * cfg.resizes[i]
        offsets.append(jnp.zeros((out_ch, hh, ww), dtype))
    # latent input is itself a trainable parameter in the Google model usage
    key, k = jax.random.split(key)
    latent = jax.random.normal(k, (cfg.latent_size,), dtype)
    return {"dense": dense, "convs": convs, "offsets": offsets, "latent": latent}


def _global_normalize(x, eps=1e-6):
    """Normalize over all non-batch axes (reference: networks.py:540-548)."""
    mean = jnp.mean(x)
    var = jnp.var(x, ddof=1)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _conv2d_same(x, W, b, kernel_size):
    """x: (C_in, H, W); W: (C_out, C_in, kh, kw)."""
    (pt, pb), (pl, pr) = _same_pad(x.shape[1], x.shape[2], *kernel_size)
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr)))
    out = jax.lax.conv_general_dilated(
        xp[None], W, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]
    return out + b[:, None, None]


def cnn_apply(params, cfg: CNNConfig, latent=None):
    """latent (optional override) -> density logits of shape grid_dims."""
    z = params["latent"] if latent is None else latent
    x = z @ params["dense"]["w"].T + params["dense"]["b"]
    h, w = cfg.base_hw
    x = x.reshape(cfg.dense_channels, h, w)
    for i, conv in enumerate(params["convs"]):
        x = jnp.tanh(x)
        r = cfg.resizes[i]
        if r != 1:
            x = jax.image.resize(
                x, (x.shape[0], x.shape[1] * r, x.shape[2] * r), method="bilinear"
            )
        x = _global_normalize(x)
        x = _conv2d_same(x, conv["w"], conv["b"], cfg.kernel_size)
        if cfg.offset_scale != 0:
            x = x + cfg.offset_scale * params["offsets"][i]
    return x[0]  # single channel -> (H, W)


# ---------------------------------------------------------------------------
# Deconv GAN-style generator (reference: networks.py:329-381)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DeconvConfig:
    in_features: int = 1
    design: Tuple[int, int] = (180, 60)


def init_deconv_generator(key, cfg: DeconvConfig, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "linear": {
            "w": 0.02 * jax.random.normal(k1, (4, cfg.in_features), dtype),
            "b": jnp.zeros((4,), dtype),
        },
        # ConvTranspose2d(4->2, k=7, pad=2, stride=2), (2->1, k=4, pad=2, stride=2)
        "deconv1": {
            "w": 0.02 * jax.random.normal(k2, (4, 2, 7, 7), dtype),
            "b": jnp.zeros((2,), dtype),
        },
        "deconv2": {
            "w": 0.02 * jax.random.normal(k3, (2, 1, 4, 4), dtype),
            "b": jnp.zeros((1,), dtype),
        },
    }
    return params


def _conv_transpose2d(x, W, b, stride, padding):
    """torch ConvTranspose2d semantics: out = (in-1)*s - 2p + k.

    Implemented as input dilation + regular conv with the spatially
    flipped, IO-swapped kernel, padded by k-1-p per side.
    W: (in_ch, out_ch, kh, kw) (torch layout).
    """
    kh, kw = W.shape[2], W.shape[3]
    Wt = jnp.flip(W.transpose(1, 0, 2, 3), axis=(2, 3))  # (out, in, kh, kw)
    out = jax.lax.conv_general_dilated(
        x[None], Wt, window_strides=(1, 1),
        padding=((kh - 1 - padding,) * 2, (kw - 1 - padding,) * 2),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]
    return out + b[:, None, None]


def deconv_generator_apply(params, cfg: DeconvConfig, z):
    """z: (latent, in_features) laid out like the reference's dataset."""
    z = z.astype(params["linear"]["w"].dtype)
    x = z @ params["linear"]["w"].T + params["linear"]["b"]
    x = x.reshape(4, cfg.design[0] // 4, cfg.design[1] // 4)
    x = _conv_transpose2d(x, params["deconv1"]["w"], params["deconv1"]["b"], 2, 2)
    x = jnp.tanh(_conv_transpose2d(x, params["deconv2"]["w"], params["deconv2"]["b"], 2, 2))
    # fixed 3x3 average filter (reference: networks.py:357-362)
    kern = jnp.ones((1, 1, 3, 3), dtype=x.dtype) / 9.0
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    x = jax.lax.conv_general_dilated(
        xp[None], kern, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )[0]
    return x[0]
