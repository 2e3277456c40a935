"""applyK / assembly / solve consistency tests.

Mirrors the reference correctness strategy: matrix-free matvec vs dense
assembly on tiny grids, symmetry/energy checks, and a full solve against
the dense direct oracle (SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ndr_tpu.fem import element as el
from ndr_tpu.fem import operators as ops
from ndr_tpu.fem import solvers
from ndr_tpu.grid import make_grid
from ndr_tpu.io.problem import load_bcs
from ndr_tpu.fem.simulator import build_problem


def _setup(dims, corners=None, seed=0):
    grid = make_grid(dims, corners)
    mat = el.IsotropicMaterial(1.0, 0.3, grid.ndim)
    K0 = el.element_stiffness_matrix(tuple([1] * grid.ndim), grid.stretchings, mat)
    rng = np.random.default_rng(seed)
    rho = rng.uniform(0.05, 1.0, size=grid.dims)
    young = np.asarray(1e-4 + rho ** 3 * (1 - 1e-4))
    return grid, K0, young, rng


@pytest.mark.parametrize("dims,corners", [
    ((4, 3), [[0, 0], [2, 1]]),
    ((3, 2, 4), [[0, 0, 0], [1.5, 1, 2]]),
])
def test_apply_k_matches_dense(dims, corners):
    grid, K0, young, rng = _setup(dims, corners)
    K = ops.assemble_dense_k(young, K0, grid)
    np.testing.assert_allclose(K, K.T, atol=1e-12)

    u = rng.normal(size=grid.nodes_per_dim + (grid.ndim,))
    f_dense = (K @ u.reshape(-1)).reshape(u.shape)
    f_mf = ops.apply_k(jnp.asarray(u), jnp.asarray(young), jnp.asarray(K0), grid)
    np.testing.assert_allclose(np.asarray(f_mf), f_dense, rtol=1e-10, atol=1e-12)

    # cached-Ke variant must agree
    Ke = jnp.asarray(young)[..., None, None] * jnp.asarray(K0)
    f_c = ops.apply_k_cached(jnp.asarray(u), Ke, grid)
    np.testing.assert_allclose(np.asarray(f_c), f_dense, rtol=1e-10, atol=1e-12)

    # energy positivity
    assert float(jnp.vdot(jnp.asarray(u), f_mf)) > 0


@pytest.mark.parametrize("dims", [(3, 4), (3, 2, 4)])
def test_node_diag_blocks_match_dense(dims):
    # exercises the 2^N-tap conv formulation in 2D and 3D (odd dims too)
    grid, K0, young, rng = _setup(dims)
    K = ops.assemble_dense_k(young, K0, grid)
    blocks = np.asarray(ops.node_diag_blocks(jnp.asarray(young), K0, grid))
    N = grid.ndim
    for n in range(grid.num_nodes):
        idx = np.arange(N) + N * n
        np.testing.assert_allclose(
            blocks.reshape(-1, N, N)[n], K[np.ix_(idx, idx)], atol=1e-12
        )


def test_traced_dense_assembly_matches_numpy():
    grid, K0, young, rng = _setup((3, 2, 2))
    Ke = jnp.asarray(young)[..., None, None] * jnp.asarray(K0)
    K_traced = np.asarray(solvers.assemble_dense_k_traced(Ke, grid))
    K_np = ops.assemble_dense_k(young, K0, grid)
    np.testing.assert_allclose(K_traced, K_np, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("prob_path,dims", [
    ("problems/2d/mbb_beam.json", (12, 4)),
    ("problems/3d/cantilever_flexion.json", (6, 4, 4)),
])
def test_solve_dense_vs_cg(prob_path, dims):
    from ndr_tpu.io.problem import load_problem
    from ndr_tpu.fem.simulator import problem_from_config

    cfg = load_problem(prob_path)
    prob, grid = problem_from_config(cfg, dims=dims)
    rho = jnp.full(grid.dims, cfg.max_volume, dtype=prob.force.dtype)
    young = prob.young(rho)

    u_direct = solvers.dense_solve(young, prob.K0, prob.dirichlet_mask, prob.force, grid)

    def apply_a(u):
        return prob.zero_dirichlet(prob.apply_k(prob.zero_dirichlet(u), rho))

    b = prob.zero_dirichlet(prob.force)
    u_cg, iters = solvers.conjugate_gradient(
        apply_a, b, jnp.zeros_like(b), tol=1e-10, max_iter=2000
    )
    np.testing.assert_allclose(np.asarray(u_cg), np.asarray(u_direct), atol=1e-7)

    # compliance is positive and matches f^T u / 2 under both solvers
    c1 = 0.5 * float(jnp.vdot(prob.force, u_direct))
    c2 = 0.5 * float(jnp.vdot(prob.force, u_cg))
    assert c1 > 0
    np.testing.assert_allclose(c1, c2, rtol=1e-8)


def test_bc_semantics_mbb():
    """MBB: left edge x-fixed, top-right corner y-fixed, unit downward force
    at bottom-left corner node."""
    grid = make_grid((6, 4), [[0, 0], [3, 1]])
    bcs = load_bcs("bcs/2d/mbb_beam.bc", grid)
    mask = bcs.dirichlet_mask
    # left edge: all x-components fixed
    assert mask[0, :, 0].all()
    assert not mask[1:, :, 0].any()
    # top-right corner: y fixed
    assert mask[-1, -1, 1]
    assert mask[..., 1].sum() == 1
    # force: single node bottom-left with (0, -1)
    f = bcs.force
    assert f[0, 0, 1] == -1.0
    assert np.abs(f).sum() == 1.0


def test_bc_force_split_across_region():
    """2D bridge: force spread across the full top edge, total = (0,-1)."""
    grid = make_grid((10, 5), [[0, 0], [2, 1]])
    bcs = load_bcs("bcs/2d/bridge.bc", grid)
    f = bcs.force
    assert np.allclose(f[..., 1].sum(), -1.0)
    # 11 top-edge nodes share the load equally
    np.testing.assert_allclose(f[:, -1, 1], -1.0 / 11)
