"""Degree-2 (quadratic tensor-product Lagrange) element capability.

The reference's ``Element_T<Degrees...>`` is degree-generic but its
python bindings instantiate only degrees (1,1)/(1,1,1)
(reference: VoxelFEM/python_bindings/VoxelFEM.cc:226-228); our core is
likewise degree-generic end-to-end on the XLA paths — element Ke
(element.py), matrix-free applyK / dense assembly (operators.py),
CG + dense direct solves (solvers.py, topopt.solve_displacement_cg),
BC box%-region application on the equispaced degree-2 node lattice
(io/problem.py). Multigrid and the Pallas kernels keep their documented
degree-1 guards (the reference's production configuration).

These tests pin that capability: Ke structure, matvec-vs-dense
equivalence, dense-vs-CG solve agreement, superior coarse-grid accuracy
vs degree 1, and an end-to-end OC optimization at degree 2.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from ndr_tpu.fem import element as el
from ndr_tpu.fem import operators as ops
from ndr_tpu.fem import solvers
from ndr_tpu.fem import topopt
from ndr_tpu.grid import make_grid
from ndr_tpu.io.problem import load_problem
from ndr_tpu.fem.simulator import build_problem, problem_from_config
from ndr_tpu.training.classic import ground_truth_topopt


def _setup(dims, corners, degree, seed=0):
    grid = make_grid(dims, corners, degree=degree)
    mat = el.IsotropicMaterial(1.0, 0.3, grid.ndim)
    K0 = el.element_stiffness_matrix(
        tuple([degree] * grid.ndim), grid.stretchings, mat
    )
    rng = np.random.default_rng(seed)
    rho = rng.uniform(0.05, 1.0, size=grid.dims)
    young = np.asarray(1e-4 + rho ** 3 * (1 - 1e-4))
    return grid, K0, young, rng


@pytest.mark.parametrize("ndim", [2, 3])
def test_degree2_ke_rigid_modes_and_symmetry(ndim):
    """Degree-2 Ke is symmetric PSD with exactly the rigid-body null
    space (translations + rotations), like the degree-1 suite pins."""
    grid, K0, _, _ = _setup(
        tuple([1] * ndim), [[0] * ndim, [1.0] * ndim], degree=2
    )
    K0 = np.asarray(K0)
    np.testing.assert_allclose(K0, K0.T, atol=1e-12)
    w = np.linalg.eigvalsh(K0)
    n_rigid = 3 if ndim == 2 else 6
    assert np.all(w[:n_rigid] < 1e-10 * w[-1])
    assert w[n_rigid] > 1e-6 * w[-1]
    # translations are null vectors
    npe = grid.nodes_per_elem
    for d in range(ndim):
        t = np.zeros((npe, ndim))
        t[:, d] = 1.0
        np.testing.assert_allclose(K0 @ t.reshape(-1), 0.0, atol=1e-12)


@pytest.mark.parametrize("dims,corners", [
    ((3, 2), [[0, 0], [1.5, 1]]),
    ((2, 2, 2), [[0, 0, 0], [1, 1, 1]]),
])
def test_degree2_apply_k_matches_dense(dims, corners):
    grid, K0, young, rng = _setup(dims, corners, degree=2)
    K = ops.assemble_dense_k(young, K0, grid)
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    u = rng.normal(size=grid.nodes_per_dim + (grid.ndim,))
    f_free = ops.apply_k(jnp.asarray(u), jnp.asarray(young),
                         jnp.asarray(K0), grid)
    np.testing.assert_allclose(
        np.asarray(f_free).reshape(-1), K @ u.reshape(-1),
        rtol=1e-9, atol=1e-10,
    )


def _mbb_problem(dims, degree, dtype=jnp.float64):
    cfg = load_problem("problems/2d/mbb_beam.json")
    cfg = dataclasses.replace(cfg, order_fem=(degree,) * 2)
    return problem_from_config(cfg, dims=dims, dtype=dtype)


def test_degree2_cg_matches_dense_solve():
    """Full degree-2 BC-pinned solve: matrix-free block-Jacobi CG vs the
    dense direct oracle on the real MBB boundary conditions."""
    prob, grid = _mbb_problem((6, 2), degree=2)
    rho = jnp.full(grid.dims, 0.5, jnp.float64)
    young = prob.young(rho)
    u_dense = solvers.dense_solve(
        young, prob.K0, prob.dirichlet_mask, prob.force, grid
    )
    u_cg, _ = topopt.solve_displacement_cg(prob, rho, tol=1e-12)
    np.testing.assert_allclose(
        np.asarray(u_cg), np.asarray(u_dense), rtol=1e-6, atol=1e-9
    )
    c = float(jnp.vdot(prob.force, u_dense))
    assert np.isfinite(c) and c > 0


def test_degree2_make_mg_solver_falls_back_to_jacobi():
    """make_mg_solver on a degree-2 grid: coarsening is a degree-1
    construction, so the solver must clamp to num_levels=0 block-Jacobi
    PCG (same fallback as un-coarsenable grids) and still match the
    dense direct oracle."""
    from ndr_tpu.fem import multigrid as mg

    prob, grid = _mbb_problem((6, 2), degree=2)
    assert mg.max_feasible_coarsenings(grid) == 0
    solve = mg.make_mg_solver(
        prob, mg.MGSolverSettings(num_levels=3, cg_iter=4000, tol=1e-12)
    )
    assert solve.settings.precond == "jacobi"
    rho = jnp.full(grid.dims, 0.5, jnp.float64)
    u, iters = solve(rho)
    u_dense = solvers.dense_solve(
        prob.young(rho), prob.K0, prob.dirichlet_mask, prob.force, grid
    )
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(u_dense), rtol=1e-6, atol=1e-9
    )


def test_degree2_color_masks_partition_grid():
    """(degree+1)^N node classes partition the node lattice and are
    element-independent: two same-class nodes never share an element
    (the debugMulticolorVisit invariant at degree 2)."""
    from ndr_tpu.fem.multigrid import _parity_color_masks

    grid = make_grid((3, 2), [[0, 0], [1.5, 1]], degree=2)
    masks = _parity_color_masks(grid)
    assert masks.shape[0] == 9
    np.testing.assert_array_equal(masks.sum(axis=0), 1)
    offs = ops.local_node_offsets(grid)
    # element at (i,j) touches nodes 2*(i,j)+offs; same-color nodes in a
    # single element would collide mod 3
    for m in masks:
        idx = np.argwhere(m)
        assert len({tuple(x % 3) for x in idx}) <= 1


def test_degree2_more_accurate_than_degree1_per_element():
    """At matched ELEMENT counts a quadratic discretization resolves the
    MBB compliance better: degree-2 compliance must sit between the
    coarse degree-1 value and a fine-grid degree-1 reference (elasticity
    energy converges monotonically from below for conforming
    refinements of this displacement-loaded problem)."""
    def compliance(dims, degree):
        prob, grid = _mbb_problem(dims, degree)
        rho = jnp.full(grid.dims, 1.0, jnp.float64)
        u = solvers.dense_solve(
            prob.young(rho), prob.K0, prob.dirichlet_mask, prob.force, grid
        )
        return float(jnp.vdot(prob.force, u))

    c1 = compliance((12, 4), 1)
    c2 = compliance((12, 4), 2)
    c_ref = compliance((36, 12), 1)
    # richer space => more flexible => larger compliance, toward c_ref
    assert c2 > c1
    assert abs(c2 - c_ref) < abs(c1 - c_ref)


def test_degree2_oc_end_to_end():
    """Classic OC at degree 2 through the driver's CG path (mgl=0 —
    the reference's exact-solve configuration)."""
    cfg = load_problem("problems/2d/mbb_beam.json")
    cfg = dataclasses.replace(cfg, order_fem=(2, 2))
    result = ground_truth_topopt(
        cfg, dims=(12, 4), max_iter=6, multigrid_levels=0,
        dtype=jnp.float64, log=lambda s: None,
    )
    hist = np.asarray(result.history)
    assert np.all(np.isfinite(hist))
    assert hist[-1] < hist[0]
    # volume constraint held (OC bisects on the *filtered* density)
    assert abs(float(np.mean(result.physical)) - cfg.max_volume) < 1e-3
