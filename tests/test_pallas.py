"""Pallas fused applyK kernel vs the XLA reference path.

Runs in interpreter mode on CPU (exact same kernel logic the TPU
executes; on-device performance is covered by bench/probe scripts).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ndr_tpu.fem import operators as ops
from ndr_tpu.fem import pallas_kernels as pk
from ndr_tpu.fem.simulator import problem_from_config
from ndr_tpu.io.problem import load_problem


@pytest.mark.parametrize("prob_path,dims,slab", [
    ("problems/2d/mbb_beam.json", (12, 6), 4),
    ("problems/2d/mbb_beam.json", (10, 7), 5),   # non-divisible fallback slab
    ("problems/3d/cantilever_flexion.json", (8, 4, 4), 4),
    ("problems/3d/cantilever_flexion.json", (6, 4, 2), 8),  # slab > divisor
])
def test_pallas_apply_k_matches_xla(prob_path, dims, slab):
    cfg = load_problem(prob_path)
    prob, grid = problem_from_config(cfg, dims=dims, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    young = prob.young(jnp.asarray(rng.uniform(0.1, 1.0, grid.dims), jnp.float32))
    u = jnp.asarray(
        rng.standard_normal(grid.nodes_per_dim + (grid.ndim,)), jnp.float32
    )
    f_ref = ops.apply_k(u, young, prob.K0, grid)
    f_pl = pk.apply_k_pallas(u, young, prob.K0, grid, slab=slab, interpret=True)
    err = float(jnp.abs(f_pl - f_ref).max() / jnp.abs(f_ref).max())
    assert err < 1e-5, err
