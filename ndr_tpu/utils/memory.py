"""Model/program memory estimation.

TPU-native replacement for the reference's ``SizeEstimator``
(reference: utils.py:165-243), which walks torch modules summing
parameter and activation tensor sizes. Under XLA the compiler — not the
module graph — decides what is materialized (fusion eliminates most
"activations"; remat re-creates others), so the honest numbers come
from the compiled executable itself via ``compiled.memory_analysis()``.
``param_bytes`` provides the torch-comparable parameter-only figure.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import numpy as np


def param_bytes(params: Any) -> int:
    """Total bytes of a parameter pytree (reference:
    SizeEstimator.calc_param_bits / count_parameters)."""
    leaves = jax.tree_util.tree_leaves(params)
    return int(sum(np.prod(np.shape(l)) * np.dtype(l.dtype).itemsize
                   for l in leaves))


def estimate_size(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Compile ``fn(*args)`` (abstractly — nothing executes) and report
    the executable's real memory footprint in megabytes.

    Returns keys: ``argument_mb``, ``output_mb``, ``temp_mb`` (XLA
    scratch — the fused "activation" memory), ``generated_code_mb``,
    and ``total_mb``. The reference's forward+backward estimate
    corresponds to compiling the value-and-grad of ``fn``.
    """
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ma = compiled.memory_analysis()
    mb = 1.0 / (1024 ** 2)
    if ma is None:  # backend without memory analysis support
        return {}
    out = {
        "argument_mb": ma.argument_size_in_bytes * mb,
        "output_mb": ma.output_size_in_bytes * mb,
        "temp_mb": ma.temp_size_in_bytes * mb,
        "generated_code_mb": ma.generated_code_size_in_bytes * mb,
    }
    out["total_mb"] = sum(out.values())
    return out
