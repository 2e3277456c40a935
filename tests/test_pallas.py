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


@pytest.mark.parametrize("prob_path,dims", [
    ("problems/2d/mbb_beam.json", (12, 6)),
    ("problems/2d/mbb_beam.json", (10, 7)),
    ("problems/3d/cantilever_flexion.json", (8, 4, 4)),
    ("problems/3d/cantilever_flexion.json", (6, 4, 2)),
])
def test_pallas_flat_apply_matches_xla(prob_path, dims):
    """Flattened single-copy kernel (roll-based stencil + carry scratch)
    vs the XLA reference path."""
    cfg = load_problem(prob_path)
    prob, grid = problem_from_config(cfg, dims=dims, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    young = prob.young(jnp.asarray(rng.uniform(0.1, 1.0, grid.dims), jnp.float32))
    u = jnp.asarray(
        rng.standard_normal(grid.nodes_per_dim + (grid.ndim,)), jnp.float32
    )
    f_ref = ops.apply_k(u, young, prob.K0, grid)
    f_pl = pk.apply_k_pallas_flat(u, young, prob.K0, grid, interpret=True)
    err = float(jnp.abs(f_pl - f_ref).max() / jnp.abs(f_ref).max())
    assert err < 1e-5, err


@pytest.mark.parametrize("prob_path,dims,slab", [
    ("problems/2d/mbb_beam.json", (12, 6), 4),
    ("problems/3d/cantilever_flexion.json", (8, 4, 4), 4),
    ("problems/3d/cantilever_flexion.json", (6, 4, 2), 8),
])
def test_pallas_df_apply_matches_float64(prob_path, dims, slab):
    """Two-float residual kernel vs the float64 XLA oracle.

    The point of apply_k_pallas_df is measuring true residuals whose
    magnitude sits far below the fp32 noise floor. Its accuracy floor is
    ~2^-36 of the local force magnitude (the lo-stream accumulates with
    naive adds; see the kernel's compiler-safety note), i.e. ~1e-11
    relative — 3+ orders below fp32's 1e-7, enough for refinement
    tolerances >= 1e-6 (the solver falls back to the XLA float64 apply
    for deeper tolerances)."""
    if not jax.config.jax_enable_x64:
        pytest.skip("needs x64")
    cfg = load_problem(prob_path)
    prob, grid = problem_from_config(cfg, dims=dims, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    rho = jnp.asarray(rng.uniform(1e-4, 1.0, grid.dims), jnp.float64)
    young64 = prob.young(rho)
    # large-magnitude u: stresses the cancellation the kernel must survive
    u = jnp.asarray(
        1e4 * rng.standard_normal(grid.nodes_per_dim + (grid.ndim,)),
        jnp.float64,
    )
    K0_64 = jnp.asarray(np.asarray(prob.K0), jnp.float64)
    f_ref = ops.apply_k(u, young64, K0_64, grid)

    f32 = jnp.float32
    u_hi = u.astype(f32)
    u_lo = (u - u_hi.astype(jnp.float64)).astype(f32)
    y_hi = young64.astype(f32)
    y_lo = (young64 - y_hi.astype(jnp.float64)).astype(f32)
    f_df = pk.apply_k_pallas_df(u_hi, u_lo, y_hi, y_lo, np.asarray(prob.K0),
                                grid, slab=slab, interpret=True)
    err = float(jnp.abs(f_df - f_ref).max() / jnp.abs(f_ref).max())
    assert err < 2e-10, err


@pytest.mark.parametrize("prob_path,dims", [
    ("problems/2d/mbb_beam.json", (12, 6)),
    ("problems/3d/cantilever_flexion.json", (8, 4, 4)),
    ("problems/3d/cantilever_flexion.json", (6, 4, 2)),
])
def test_pallas_flat_df_apply_matches_float64(prob_path, dims):
    """Flat-layout two-float kernel vs the float64 XLA oracle (same
    accuracy contract as apply_k_pallas_df)."""
    if not jax.config.jax_enable_x64:
        pytest.skip("needs x64")
    cfg = load_problem(prob_path)
    prob, grid = problem_from_config(cfg, dims=dims, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    rho = jnp.asarray(rng.uniform(1e-4, 1.0, grid.dims), jnp.float64)
    young64 = prob.young(rho)
    u = jnp.asarray(
        1e4 * rng.standard_normal(grid.nodes_per_dim + (grid.ndim,)),
        jnp.float64,
    )
    K0_64 = jnp.asarray(np.asarray(prob.K0), jnp.float64)
    f_ref = ops.apply_k(u, young64, K0_64, grid)
    f32 = jnp.float32
    u_hi = u.astype(f32)
    u_lo = (u - u_hi.astype(jnp.float64)).astype(f32)
    y_hi = young64.astype(f32)
    y_lo = (young64 - y_hi.astype(jnp.float64)).astype(f32)
    f_df = pk.apply_k_pallas_df_flat(
        u_hi, u_lo, y_hi, y_lo, np.asarray(prob.K0), grid, interpret=True)
    err = float(jnp.abs(f_df - f_ref).max() / jnp.abs(f_ref).max())
    assert err < 2e-10, err


@pytest.mark.parametrize("prob_path,dims,slab,ke_dtype", [
    ("problems/2d/mbb_beam.json", (12, 6), 4, jnp.float32),
    ("problems/3d/cantilever_flexion.json", (8, 4, 4), 4, jnp.float32),
    ("problems/3d/cantilever_flexion.json", (6, 4, 2), 8, jnp.float32),
    ("problems/3d/cantilever_flexion.json", (8, 4, 4), 4, jnp.bfloat16),
])
def test_pallas_cached_apply_matches_xla(prob_path, dims, slab, ke_dtype):
    """Streamed cached-Ke kernel vs operators.apply_k_cached on a
    realistic Galerkin level-1 stack."""
    from ndr_tpu.fem import multigrid as mg
    from ndr_tpu.fem.simulator import problem_from_config as pfc

    cfg = load_problem(prob_path)
    prob, grid = pfc(cfg, dims=dims, dtype=jnp.float32)
    mgcfg = mg.build_mg_config(prob, 1)
    rng = np.random.default_rng(3)
    young = prob.young(
        jnp.asarray(rng.uniform(0.1, 1.0, grid.dims), jnp.float32))
    Ke1 = mg.build_level_ke(mgcfg, young, 1)
    grid1 = mgcfg.levels[1].grid
    u = jnp.asarray(
        rng.standard_normal(grid1.nodes_per_dim + (grid1.ndim,)),
        jnp.float32,
    )
    f_ref = ops.apply_k_cached(u, Ke1.astype(ke_dtype), grid1)
    stream = pk.ke_stream_layout(Ke1, grid1).astype(ke_dtype)
    f_pl = pk.apply_k_pallas_cached(u, stream, grid1, slab=slab,
                                    interpret=True)
    err = float(jnp.abs(f_pl - f_ref).max() / jnp.abs(f_ref).max())
    tol = 1e-5 if ke_dtype == jnp.float32 else 2e-2
    assert err < tol, err


@pytest.mark.skipif(
    not __import__("os").environ.get("NDR_TEST_TPU"),
    reason="real-TPU smoke (set NDR_TEST_TPU=1 on a TPU host); covers the "
           "Mosaic lowering branch (pltpu.roll i32 shifts) that "
           "interpret-mode CI cannot reach (ADVICE r3)")
def test_pallas_flat_apply_on_device_x64():
    """Device smoke for the flat kernel's non-interpret branch under
    jax_enable_x64: the roll shifts must lower as i32 (a bare Python int
    lowers as i64 and tpu.dynamic_rotate rejects it — pallas_kernels.py
    _flat_kernel_body roll()). Runs in a subprocess so the conftest's
    CPU-forced backend in this process is untouched."""
    import os
    import subprocess
    import sys

    body = """
import jax, numpy as np, jax.numpy as jnp
from ndr_tpu.utils.jax_setup import setup
setup()
assert jax.devices()[0].platform != "cpu", jax.devices()
from ndr_tpu.fem import operators as ops
from ndr_tpu.fem import pallas_kernels as pk
from ndr_tpu.fem.simulator import problem_from_config
from ndr_tpu.io.problem import load_problem
cfg = load_problem("problems/3d/cantilever_flexion.json")
prob, grid = problem_from_config(cfg, dims=(16, 8, 8), dtype=jnp.float32)
rng = np.random.default_rng(0)
young = prob.young(jnp.asarray(rng.uniform(0.1, 1.0, grid.dims), jnp.float32))
u = jnp.asarray(rng.standard_normal(grid.nodes_per_dim + (grid.ndim,)),
                jnp.float32)
f_ref = ops.apply_k(u, young, prob.K0, grid)
f_pl = pk.apply_k_pallas_flat(u, young, np.asarray(prob.K0), grid)
err = float(jnp.abs(f_pl - f_ref).max() / jnp.abs(f_ref).max())
assert err < 1e-5, err
print("device flat kernel OK", err)
"""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the TPU plugin claim the backend
    proc = subprocess.run([sys.executable, "-c", body], cwd=os.getcwd(),
                          env=env, capture_output=True, text=True,
                          timeout=600)
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")
