"""Fourier-feature MLP — the paper's neural design representation.

Matches the reference `networks.MLP` (networks.py:127-262) exactly:

  * Gaussian Fourier-feature embedding: ``B ~ N(0, 1) * sigma`` drawn once
    at init and *not trained* (a buffer, not a parameter — the reference
    explicitly saves/restores it beside the state dict, utils.py:258-281).
    ``sigma`` is the frequency-tuning knob of the paper.
  * encode(x) = [sin(2 pi x B^T), cos(2 pi x B^T)]  (networks.py:182-184)
  * `n_layers` Linear layers (first 2*embed -> n_neurons, last -> out),
    ReLU hidden activations, optional output activation.
  * orthogonal init with gain sqrt(max(n_neurons / embedding_size, 1)),
    zero biases (networks.py:242-256).
  * :func:`homogeneous_init` — re-initialize the *last* layer with tiny
    weights and bias = v_max so iteration 0 produces a uniform field at
    the target volume (reference: fem.py:376-401).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    in_features: int = 2
    out_features: int = 1
    n_neurons: int = 256
    n_layers: int = 4
    embedding_size: int = 256
    scale: float = 0.0                      # sigma of the Fourier features
    output_activation: Optional[str] = None  # None | "sigmoid"
    # per-op matmul precision for the network's HIDDEN-LAYER dots. The
    # solver sets the GLOBAL default to "highest" (6-pass bf16 — true-fp32
    # contraction, which MGPCG genuinely needs); the MLP does not: "high"
    # (3-pass bf16, ~fp32 accuracy) halves its MXU cost vs that, and
    # "default" (1-pass bf16) halves it again (192^3 measured: nn grad
    # 455 -> 243 ms). ReLU-MLP weights tolerate bf16 rounding; set
    # "highest" for bit-level parity studies.
    matmul_precision: str = "high"
    # the Fourier embedding x @ B^T is kept at high precision regardless:
    # a bf16-rounded phase (rel err ~4e-3) perturbs sin(2 pi x B) by up to
    # ~0.03 rad — a direct, frequency-dependent corruption of the encoding
    # — while its FLOPs (K = in_features = 2-3) are negligible anyway.
    encode_precision: str = "highest"


def _orthogonal(key, shape, gain, dtype):
    return jax.nn.initializers.orthogonal(scale=gain)(key, shape, dtype)


def init_mlp(key: jax.Array, cfg: MLPConfig, dtype=jnp.float32):
    """Returns (params, buffers): params = {'layers': [(W, b), ...]},
    buffers = {'B': embedding matrix (embed, in)} — B is not trained."""
    kB, key = jax.random.split(key)
    B = jax.random.normal(kB, (cfg.embedding_size, cfg.in_features), dtype) * cfg.scale

    gain = float(np.sqrt(max(cfg.n_neurons / cfg.embedding_size, 1.0)))
    sizes = (
        [2 * cfg.embedding_size]
        + [cfg.n_neurons] * (cfg.n_layers - 1)
        + [cfg.out_features]
    )
    layers = []
    for i in range(cfg.n_layers):
        key, k = jax.random.split(key)
        W = _orthogonal(k, (sizes[i + 1], sizes[i]), gain, dtype)
        b = jnp.zeros((sizes[i + 1],), dtype)
        layers.append({"w": W, "b": b})
    return {"layers": layers}, {"B": B}


def fourier_encode(x: jnp.ndarray, B: jnp.ndarray,
                   precision=None) -> jnp.ndarray:
    """[sin(2 pi x B^T), cos(2 pi x B^T)] (reference: networks.py:182-184)."""
    proj = jnp.matmul(2.0 * jnp.pi * x, B.T, precision=precision)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def mlp_apply(params, buffers, x: jnp.ndarray, cfg: MLPConfig,
              activation_masks=None) -> jnp.ndarray:
    """Forward pass. x: (..., in_features) -> (..., out_features).

    `activation_masks` (optional): per-hidden-layer keep masks for
    continual-learning gated activations — fixed per task, zeroing a
    random fraction of each hidden layer's outputs (reference:
    networks.py:209-234 register_gated_activations via forward hooks).
    """
    prec = cfg.matmul_precision
    h = fourier_encode(x, buffers["B"], precision=cfg.encode_precision)
    layers = params["layers"]
    for i, lyr in enumerate(layers):
        h = jnp.matmul(h, lyr["w"].T, precision=prec) + lyr["b"]
        if i < len(layers) - 1:
            if activation_masks is not None:
                h = h * activation_masks[i].astype(h.dtype)
            h = jax.nn.relu(h)
    if cfg.output_activation == "sigmoid":
        h = jax.nn.sigmoid(h)
    return h


def mlp_apply_chunked(params, buffers, x: jnp.ndarray, cfg: MLPConfig,
                      activation_masks=None,
                      max_points: int = 1 << 17) -> jnp.ndarray:
    """Memory-bounded forward pass over a large coordinate grid.

    The Fourier embedding materializes a (N, 2*embedding_size) activation:
    at multi-million-voxel grids that exceeds HBM (192x96x96 @ 1024
    features = 14.5 GB), so the flattened points are processed in
    `max_points`-sized chunks via `lax.map` with `jax.checkpoint` — the
    backward pass rematerializes each chunk's activations instead of
    storing them all. Falls through to `mlp_apply` for small inputs.

    (reference runs the full-grid batch through the torch MLP on a
    256 GB-RAM CPU node — train_xdg.py:282-329; chunking is the
    TPU-native equivalent.)
    """
    lead = x.shape[:-1]
    n = int(np.prod(lead))
    if n <= max_points:
        return mlp_apply(params, buffers, x, cfg, activation_masks)
    xf = x.reshape(n, x.shape[-1])
    n_chunks = -(-n // max_points)
    pad = n_chunks * max_points - n
    xf = jnp.pad(xf, ((0, pad), (0, 0)))

    @jax.checkpoint
    def f(c):
        return mlp_apply(params, buffers, c, cfg, activation_masks)

    out = jax.lax.map(f, xf.reshape(n_chunks, max_points, x.shape[-1]))
    out = out.reshape(n_chunks * max_points, -1)[:n]
    return out.reshape(lead + (cfg.out_features,))


def homogeneous_init(params, constant: float):
    """Zero (tiny-noise) the last layer's weights, set its bias to
    `constant`, so the first predicted field is uniform at the target
    volume fraction (reference: fem.py homogeneous_init + train_xdg.py:201).

    Deterministic N(0, 1e-4) noise is drawn with a fixed key (the scale is
    so small it only breaks exact ties).
    """
    layers = list(params["layers"])
    last = layers[-1]
    key = jax.random.PRNGKey(0)
    W = 1e-4 * jax.random.normal(key, last["w"].shape, last["w"].dtype)
    b = jnp.full_like(last["b"], constant)
    layers[-1] = {"w": W, "b": b}
    return {"layers": layers}


# ---------------------------------------------------------------------------
# Multi-headed MLP (continual learning; reference: networks.py:264-323)
# ---------------------------------------------------------------------------

def init_multihead_mlp(key, cfg: MLPConfig, n_heads: int, dtype=jnp.float32):
    """Shared trunk (the MLP minus its last layer) + per-task linear heads."""
    trunk_cfg = dataclasses.replace(cfg, scale=1.0)
    params, buffers = init_mlp(key, trunk_cfg, dtype)
    trunk = params["layers"][:-1]
    gain = float(np.sqrt(max(cfg.n_neurons / cfg.embedding_size, 1.0)))
    heads = []
    for _ in range(n_heads):
        key, k = jax.random.split(key)
        W = _orthogonal(k, (cfg.out_features, cfg.n_neurons), gain, dtype)
        heads.append({"w": W, "b": jnp.zeros((cfg.out_features,), dtype)})
    buffers = dict(buffers, old_scale=jnp.asarray(1.0, dtype))
    return {"trunk": trunk, "heads": heads}, buffers


def multihead_apply(params, buffers, x, head_idx: int, cfg: MLPConfig,
                    activation_masks=None):
    """Shared trunk + per-task head forward. `activation_masks` (one keep
    mask per trunk layer output) implements the continual-learning gated
    activations on the shared trunk (reference: networks.py:209-234,
    applied to MultiHeadedMLP's trunk via the same forward hooks)."""
    prec = cfg.matmul_precision
    h = fourier_encode(x, buffers["B"], precision=cfg.encode_precision)
    for i, lyr in enumerate(params["trunk"]):
        h = jnp.matmul(h, lyr["w"].T, precision=prec) + lyr["b"]
        if activation_masks is not None:
            h = h * activation_masks[i].astype(h.dtype)
        h = jax.nn.relu(h)
    head = params["heads"][head_idx]
    return jnp.matmul(h, head["w"].T, precision=prec) + head["b"]


def change_scale_value(buffers, scale: float):
    """Rescale the Fourier matrix for a new task's sigma
    (reference: networks.py:300-308 MultiHeadedMLP.change_scale_value)."""
    B = buffers["B"] / buffers["old_scale"] * scale
    return dict(buffers, B=B, old_scale=jnp.asarray(scale, B.dtype))
