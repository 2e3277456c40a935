"""Coordinate / latent input providers (reference: utils.py datasets).

The reference wraps these in torch Datasets yielding a single item; here
they are plain array constructors (the "dataset" is one deterministic
batch — the coordinate grid or a latent draw).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ndr_tpu.training.neural import get_mgrid  # re-export site


def mesh_grid(sidelen: Sequence[int], domain=None, flatten: bool = False,
              dtype=jnp.float32) -> jnp.ndarray:
    """(reference: utils.MeshGrid — `sidelen` points per dim over
    `domain`, optionally flattened to (-1, N))."""
    grid = get_mgrid(sidelen, domain=domain, dtype=dtype)
    if flatten:
        return grid.reshape(-1, grid.shape[-1])
    return grid


def supervised_mesh_grid(sidelen, gt_path: str, domain=None,
                         dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coordinate grid + ground-truth densities loaded from .npy, with the
    reference's transpose/negate image convention undone
    (reference: utils.SupervisedMeshGrid, utils.py:81-110)."""
    coords = mesh_grid(sidelen, domain=domain, dtype=dtype)
    gt = np.load(gt_path).astype(np.float32)
    gt = -gt.T  # stored as save_densities' negated transpose
    return coords, jnp.asarray(gt, dtype)


def random_field(key, latent: int, std: float = 0.1, mean: float = 0.0,
                 dtype=jnp.float32) -> jnp.ndarray:
    """Latent (latent, 1) normal draw for the deconv generator
    (reference: utils.RandomField, utils.py:113-138)."""
    return mean + std * jax.random.normal(key, (latent, 1), dtype)


def normal_latent(key, latent_size: int, std: float = 1.0, mean: float = 0.0,
                  dtype=jnp.float32) -> jnp.ndarray:
    """Latent vector for the CNN generator
    (reference: utils.NormalLatent, utils.py:141-161)."""
    return mean + std * jax.random.normal(key, (latent_size,), dtype)


def count_parameters(params, trainable_only: bool = True) -> int:
    """(reference: utils.count_parameters)"""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
