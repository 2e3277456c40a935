"""Multiresolution / continual-learning curriculum utilities.

(reference: multires_utils.py + training/cl_utils.py)
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def prepare_resolutions(interval=5, start=0, end=10, order="ctf", repeat_res=1):
    """Array of resolution *deltas* added to a base grid size.

    (reference: multires_utils.py:14-46 — 'ctf' appends a repeat of the
    final entry; 'ftc' negates and appends 0.)
    """
    resolutions = np.arange(start=start, stop=end) * interval
    resolutions = np.concatenate(tuple([resolutions] * repeat_res))
    if order == "ctf":
        return np.concatenate([resolutions, np.array([resolutions[-1]])])
    if order == "ftc":
        return -np.concatenate([resolutions, np.array([0])])
    if order == "random":
        np.random.shuffle(resolutions)
        return resolutions
    raise NotImplementedError(f"order {order!r} does not exist or is WIP")


def prepare_epoch_sizes(n_resolutions, start=500, end=2000, mode="constant",
                        constant_value=1500) -> List[int]:
    """Iterations per resolution (reference: multires_utils.py:49-81)."""
    if mode == "constant":
        return [constant_value] * n_resolutions
    if mode == "linear_inc":
        return list(np.linspace(start, end, n_resolutions).astype(int))
    if mode == "linear_dec":
        return list(np.linspace(end, start, n_resolutions).astype(int))
    if mode == "linear_abs":
        dec = list(np.linspace(end, start, n_resolutions).astype(int))
        inc = list(np.linspace(start, end, n_resolutions).astype(int))
        if n_resolutions % 2 != 0:
            return list(np.concatenate([dec[::2], inc[:-2:2]]))
        return list(np.concatenate([dec[::2], inc[::2]]))
    if mode == "random":
        return list(np.random.uniform(start, end, size=(n_resolutions,)).astype(int))
    raise NotImplementedError(f"mode {mode!r} does not exist")


def prepare_task_values(interval=5, start=0, end=10, order="ctf"):
    """sigma/task schedules for continual learning
    (reference: training/cl_utils.py:10-41)."""
    task_values = np.arange(start=start, stop=end) * interval
    if order == "ctf":
        return task_values
    if order == "ftc":
        return -task_values
    if order == "random":
        np.random.shuffle(task_values)
        return task_values
    raise NotImplementedError(f"order {order!r} does not exist or is WIP")


def forget_weights(key, params, rate, mode="orthogonal", mean=0.0, std=0.1,
                   lb=-1.0, ub=1.0, n_neurons=256, embedding_size=256,
                   constant_value=1e-2):
    """Re-initialize a random fraction of every weight tensor.

    (reference: multires_utils.py:142-180 — weights resampled per `mode`,
    biases reset to zero at the forgotten positions.)
    """
    gain = float(np.sqrt(max(n_neurons / embedding_size, 1)))

    def forget_leaf(k, w):
        k1, k2 = jax.random.split(k)
        mask = jax.random.uniform(k1, w.shape) > rate  # True = forget
        if w.ndim > 1:
            if mode == "orthogonal":
                new = jax.nn.initializers.orthogonal(scale=gain)(k2, w.shape, w.dtype)
            elif mode == "normal":
                new = mean + std * jax.random.normal(k2, w.shape, w.dtype)
            elif mode == "uniform":
                new = jax.random.uniform(k2, w.shape, w.dtype, lb, ub)
            elif mode == "constant":
                new = jnp.full_like(w, constant_value)
            else:
                raise NotImplementedError(f"mode {mode!r}")
        else:
            new = jnp.zeros_like(w)
        return jnp.where(mask, new, w)

    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [forget_leaf(k, w) for k, w in zip(keys, leaves)]
    )


def make_activation_masks(key, params, rate):
    """Fixed per-task activation gates (CL 'gated activations').

    Returns a list of keep-masks, one per hidden layer output, to be
    passed to the MLP forward (reference: networks.py:209-234
    register_gated_activations — masks are drawn once per task and reused
    for the whole task).
    """
    masks = []
    if isinstance(params, dict):
        # single-head MLP: all layers but the output; multihead: the trunk
        layers = params["layers"][:-1] if "layers" in params else params["trunk"]
    else:
        layers = params
    for lyr in layers:
        key, k = jax.random.split(key)
        masks.append(jax.random.uniform(k, (lyr["w"].shape[0],)) > rate)
    return masks
