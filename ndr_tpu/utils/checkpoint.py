"""Checkpoint save/load for neural-TO training.

Stores {scale, B, params, opt_state, step} with the same resume semantics
as the reference (utils.py:259-299 save_weights/load_weights: the Fourier
matrix B and sigma are saved explicitly beside the weights, and `step` +
optimizer state enable mid-run resume via --checkpoint).

Uses orbax-free plain .npz of the flattened pytree (portable, no
container format churn); optimizer state is restored by structure.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}, treedef


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
    p_flat, _ = _flatten(params)
    payload.update({f"params/{k}": v for k, v in p_flat.items()})
    b_flat, _ = _flatten(buffers)
    payload.update({f"buffers/{k}": v for k, v in b_flat.items()})
    meta = {"scale": float(scale)}
    if step is not None:
        meta["step"] = int(step)
    if opt_state is not None:
        o_flat, _ = _flatten(opt_state)
        payload.update({f"opt/{k}": v for k, v in o_flat.items()})
    payload["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **payload)


def load_checkpoint(
    path: str, params_template, buffers_template, opt_state_template=None
) -> Tuple[Any, Any, float, Optional[int], Any]:
    """Restore (params, buffers, scale, step, opt_state) from a checkpoint.

    Templates supply the pytree structure (reference: utils.load_weights
    restores state_dict + B + scale and returns the step).
    """
    with np.load(path) as data:
        meta = json.loads(bytes(data["meta"]).decode())

        def restore(prefix, template):
            leaves, treedef = jax.tree_util.tree_flatten(template)
            new = [data[f"{prefix}/leaf_{i}"] for i in range(len(leaves))]
            return jax.tree_util.tree_unflatten(treedef, new)

        params = restore("params", params_template)
        buffers = restore("buffers", buffers_template)
        opt_state = None
        if opt_state_template is not None and any(
            k.startswith("opt/") for k in data.files
        ):
            opt_state = restore("opt", opt_state_template)
    return params, buffers, meta["scale"], meta.get("step"), opt_state
