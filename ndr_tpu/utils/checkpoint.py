"""Checkpoint save/load for neural-TO training.

Stores {scale, B, params, opt_state, step} with the same resume semantics
as the reference (utils.py:259-299 save_weights/load_weights: the Fourier
matrix B and sigma are saved explicitly beside the weights, and `step` +
optimizer state enable mid-run resume via --checkpoint).

Uses orbax-free plain .npz (portable, no container format churn). Leaves
are stored under their pytree *key paths* (e.g. ``params/layers/0/w``),
not positional indices, and restore validates both the key set and every
leaf's shape/dtype against the template — a structural change in the
model or optimizer fails loudly instead of silently misassigning
weights. (Positional ``leaf_{i}`` checkpoints from older runs are still
readable.)
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _keypath_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts) if parts else "_"


def _flatten_with_paths(tree) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        k = _keypath_str(path)
        if k in out:
            raise ValueError(f"duplicate checkpoint key {k!r}")
        out[k] = np.asarray(leaf)
    return out


def save_checkpoint(
    path: str,
    params,
    buffers,
    scale: float,
    step: Optional[int] = None,
    opt_state=None,
):
    """Save a training checkpoint (reference: utils.save_weights)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {}
    for prefix, tree in (("params", params), ("buffers", buffers)):
        for k, v in _flatten_with_paths(tree).items():
            payload[f"{prefix}/{k}"] = v
    meta = {"scale": float(scale), "format": 2}
    if step is not None:
        meta["step"] = int(step)
    if opt_state is not None:
        for k, v in _flatten_with_paths(opt_state).items():
            payload[f"opt/{k}"] = v
    payload["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    # atomic write: a crash (or a reader racing a periodic save) never
    # sees a half-written resume file
    final = path if path.endswith(".npz") else path + ".npz"
    tmp = final + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, final)


_PENDING: list = []


def save_checkpoint_async(
    path: str,
    params,
    buffers,
    scale: float,
    step: Optional[int] = None,
    opt_state=None,
):
    """Non-blocking checkpoint save for very large fields.

    Starts the device->host copies immediately (copy_to_host_async), then
    serializes + writes the .npz on a background thread so the training
    loop only pays the dispatch, not the (slow through a remote-device
    tunnel) bulk transfer + disk write. At most one write is in flight:
    a new save first joins the previous one, preserving write order.
    Call ``wait_checkpoints()`` before reading the file or exiting.
    (TPU-native analogue of orbax's async checkpointing; the on-disk
    format is the same validated .npz as save_checkpoint.)
    """
    # snapshot to fresh device buffers first: the training step donates
    # its state arrays, so the caller's leaves may be deleted by the next
    # step before the background thread serializes them. A device-side
    # copy is HBM-bandwidth cheap and never aliases the donated buffer.
    import jax.numpy as jnp

    def snap(x):
        return jnp.copy(x) if isinstance(x, jax.Array) else x

    params, buffers, opt_state = jax.tree_util.tree_map(
        snap, (params, buffers, opt_state))
    for leaf in jax.tree_util.tree_leaves((params, buffers, opt_state)):
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()
    wait_checkpoints()
    t = threading.Thread(
        target=save_checkpoint,
        args=(path, params, buffers, scale, step, opt_state),
        daemon=True,
    )
    t.start()
    _PENDING.append(t)


def wait_checkpoints():
    """Join any in-flight async checkpoint write."""
    while _PENDING:
        _PENDING.pop().join()


def _restore_tree(data, prefix, template):
    """Rebuild `template`'s pytree from stored leaves, validating keys and
    shapes; leaves are cast to the template's dtype (an x64-saved
    checkpoint restores cleanly into an fp32 run and vice versa)."""
    flat = jax.tree_util.tree_flatten_with_path(template)
    paths_leaves, treedef = flat
    stored = {k[len(prefix) + 1:]: k for k in data.files
              if k.startswith(prefix + "/")}
    want = {_keypath_str(p): leaf for p, leaf in paths_leaves}
    missing = sorted(set(want) - set(stored))
    extra = sorted(set(stored) - set(want))
    if missing or extra:
        raise ValueError(
            f"checkpoint/{prefix} structure mismatch: missing keys "
            f"{missing[:5]}{'...' if len(missing) > 5 else ''}, unexpected "
            f"keys {extra[:5]}{'...' if len(extra) > 5 else ''}"
        )
    new = []
    for p, leaf in paths_leaves:
        k = _keypath_str(p)
        arr = data[stored[k]]
        tshape = np.shape(leaf)
        if tuple(arr.shape) != tuple(tshape):
            raise ValueError(
                f"checkpoint/{prefix}/{k}: shape {arr.shape} does not match "
                f"template {tshape}"
            )
        if hasattr(leaf, "dtype") and arr.dtype != leaf.dtype:
            arr = arr.astype(leaf.dtype)
        new.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new)


def _restore_tree_positional(data, prefix, template):
    """Legacy (format-1) positional restore for old checkpoints."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new = [data[f"{prefix}/leaf_{i}"] for i in range(len(leaves))]
    for i, (a, t) in enumerate(zip(new, leaves)):
        if tuple(a.shape) != tuple(np.shape(t)):
            raise ValueError(
                f"legacy checkpoint {prefix}/leaf_{i}: shape {a.shape} does "
                f"not match template {np.shape(t)}"
            )
        if hasattr(t, "dtype") and a.dtype != t.dtype:
            new[i] = a.astype(t.dtype)
    return jax.tree_util.tree_unflatten(treedef, new)


def load_checkpoint(
    path: str, params_template, buffers_template, opt_state_template=None
) -> Tuple[Any, Any, float, Optional[int], Any]:
    """Restore (params, buffers, scale, step, opt_state) from a checkpoint.

    Templates supply the pytree structure (reference: utils.load_weights
    restores state_dict + B + scale and returns the step). Key paths,
    shapes and the key *set* are validated against the templates.
    """
    with np.load(path) as data:
        meta = json.loads(bytes(data["meta"]).decode())
        legacy = meta.get("format", 1) < 2
        restore = _restore_tree_positional if legacy else _restore_tree
        params = restore(data, "params", params_template)
        buffers = restore(data, "buffers", buffers_template)
        opt_state = None
        if opt_state_template is not None and any(
            k.startswith("opt/") for k in data.files
        ):
            opt_state = restore(data, "opt", opt_state_template)
    return params, buffers, meta["scale"], meta.get("step"), opt_state
