"""Multigrid correctness tests.

Strategy (SURVEY.md §4.5): validate every MG building block against dense
oracles on tiny grids, then check MGPCG agreement with the direct solve
and sane iteration counts.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ndr_tpu.fem import element as el
from ndr_tpu.fem import multigrid as mg
from ndr_tpu.fem import operators as ops
from ndr_tpu.fem import solvers
from ndr_tpu.fem.simulator import problem_from_config
from ndr_tpu.io.problem import load_problem


def _problem(prob_path, dims):
    cfg = load_problem(prob_path)
    prob, grid = problem_from_config(cfg, dims=dims)
    return cfg, prob, grid


def test_transfer_operators_are_adjoint():
    """restriction == prolongation^T (they share the same stencil)."""
    rng = np.random.default_rng(0)
    for nodes in [(9, 5), (5, 9, 7)]:
        ndim = len(nodes)
        coarse_nodes = tuple((n - 1) // 2 + 1 for n in nodes)
        uc = jnp.asarray(rng.standard_normal(coarse_nodes + (ndim,)))
        rf = jnp.asarray(rng.standard_normal(nodes + (ndim,)))
        lhs = jnp.vdot(mg.prolongate(uc, ndim), rf)
        rhs = jnp.vdot(uc, mg.restrict(rf, ndim))
        np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)


def test_prolongation_exact_on_linear_fields():
    """Trilinear interpolation reproduces linear fields exactly."""
    rng = np.random.default_rng(1)
    coarse_nodes = (5, 4, 3)
    ndim = 3
    A = rng.standard_normal((ndim, ndim))
    axes = [np.arange(n, dtype=np.float64) for n in coarse_nodes]
    X = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    uc = X @ A.T
    uf = np.asarray(mg.prolongate(jnp.asarray(uc), ndim))
    fine_axes = [np.arange(2 * n - 1, dtype=np.float64) / 2 for n in coarse_nodes]
    Xf = np.stack(np.meshgrid(*fine_axes, indexing="ij"), axis=-1)
    np.testing.assert_allclose(uf, Xf @ A.T, atol=1e-12)


def test_galerkin_coarsening_matches_dense_triple_product():
    """Coarse dense K equals R K_f P on a small 2-level 2D hierarchy."""
    cfg, prob, grid = _problem("problems/2d/mbb_beam.json", (8, 4))
    rng = np.random.default_rng(2)
    rho = jnp.asarray(rng.uniform(0.1, 1.0, size=grid.dims))
    young = prob.young(rho)

    mgc = mg.build_mg_config(prob, 1)
    Kes = mg.build_level_stiffness(mgc, young)
    K_coarse = np.asarray(solvers.assemble_dense_k_traced(Kes[0], mgc.levels[1].grid))

    # dense fine K and explicit prolongation matrix
    K_fine = ops.assemble_dense_k(np.asarray(young), np.asarray(prob.K0), grid)
    nc = mgc.levels[1].grid.num_nodes * 2
    P = np.zeros((grid.num_nodes * 2, nc))
    for j in range(nc):
        e = np.zeros(nc)
        e[j] = 1.0
        ec = e.reshape(mgc.levels[1].grid.nodes_per_dim + (2,))
        P[:, j] = np.asarray(mg.prolongate(jnp.asarray(ec), 2)).reshape(-1)
    np.testing.assert_allclose(K_coarse, P.T @ K_fine @ P, atol=1e-10)


def test_dirichlet_coarsening_rule():
    """Left-edge fine constraints coarsen to the left edge; a face
    constraint at an odd interior height spreads to both adjacent coarse
    nodes; all-odd interior constraints raise."""
    fine = np.zeros((9, 5, 2), dtype=bool)
    fine[0, :, 0] = True          # left edge, x component
    fine[4, 0, 1] = True          # bottom edge node at even x=4 -> coarse x=2
    coarse = mg.coarsen_dirichlet_mask(fine)
    assert coarse[0, :, 0].all()
    assert not coarse[1:, :, 0].any()
    assert coarse[2, 0, 1] and coarse[:, :, 1].sum() == 1

    fine2 = np.zeros((9, 5, 2), dtype=bool)
    fine2[3, 0, 1] = True         # odd x on boundary y=0 -> coarse x in {1,2}
    c2 = mg.coarsen_dirichlet_mask(fine2)
    assert c2[1, 0, 1] and c2[2, 0, 1] and c2[:, :, 1].sum() == 2

    bad = np.zeros((9, 5, 2), dtype=bool)
    bad[3, 3, 0] = True           # all-odd interior
    with pytest.raises(ValueError):
        mg.coarsen_dirichlet_mask(bad)


def test_gs_sweep_reduces_energy_and_respects_dirichlet():
    cfg, prob, grid = _problem("problems/2d/mbb_beam.json", (8, 4))
    rng = np.random.default_rng(3)
    rho = jnp.asarray(rng.uniform(0.3, 1.0, size=grid.dims))
    young = prob.young(rho)
    mgc = mg.build_mg_config(prob, 1)
    levels = mg.build_level_states(mgc, prob, young)
    lv = levels[0]

    b = mg._zero_dirichlet(lv, prob.force)
    u = jnp.zeros_like(b)

    def err(u):
        r = b - mg._apply_k_level(lv, u)
        return float(jnp.linalg.norm(mg._zero_dirichlet(lv, r)))

    errs = [err(u)]
    for _ in range(6):
        u = mg.gs_sweep(lv, u, b, forward=True)
        u = mg.gs_sweep(lv, u, b, forward=False)
        errs.append(err(u))
    # a smoother reduces the residual monotonically (slowly on the smooth
    # modes — that is what the coarse-grid correction is for)
    assert all(b < a for a, b in zip(errs, errs[1:]))
    assert errs[-1] < 0.75 * errs[0]
    # Dirichlet components stay zero
    assert float(jnp.abs(jnp.where(lv.dirichlet_mask, u, 0.0)).max()) == 0.0


@pytest.mark.parametrize("prob_path,dims,levels", [
    ("problems/2d/mbb_beam.json", (16, 8), 2),
    ("problems/3d/cantilever_flexion.json", (8, 4, 4), 1),
])
def test_mgpcg_matches_direct(prob_path, dims, levels):
    cfg, prob, grid = _problem(prob_path, dims)
    rng = np.random.default_rng(4)
    rho = jnp.asarray(rng.uniform(0.1, 1.0, size=grid.dims))
    young = prob.young(rho)

    u_direct = solvers.dense_solve(young, prob.K0, prob.dirichlet_mask, prob.force, grid)

    settings = mg.MGSolverSettings(num_levels=levels, cg_iter=100, tol=1e-10)
    solve = mg.make_mg_solver(prob, settings)
    u_mg, iters = solve(rho, None)

    np.testing.assert_allclose(np.asarray(u_mg), np.asarray(u_direct), atol=1e-7)
    # preconditioner quality: far fewer iterations than unpreconditioned CG
    assert int(iters) < 40


def test_jacobi_fallback_on_indivisible_grid():
    """A grid that cannot coarsen (odd dim, like the 2D bridge's 250x125)
    must transparently fall back to block-Jacobi PCG and still converge
    to the direct solution."""
    # (14,7): 7 is odd -> zero coarsenings -> auto block-Jacobi
    cfg, prob, grid = _problem("problems/2d/mbb_beam.json", (14, 7))
    assert mg.max_feasible_coarsenings(grid) == 0
    rng = np.random.default_rng(5)
    rho = jnp.asarray(rng.uniform(0.1, 1.0, size=grid.dims))
    young = prob.young(rho)
    u_direct = solvers.dense_solve(young, prob.K0, prob.dirichlet_mask,
                                   prob.force, grid)
    st = mg.MGSolverSettings(num_levels=3, cg_iter=2000, tol=1e-10)
    u_j, _ = mg.make_mg_solver(prob, st)(rho, None)
    np.testing.assert_allclose(np.asarray(u_j), np.asarray(u_direct),
                               atol=1e-7)

    # (12,6)->(6,3): one feasible coarsening; a 3-level request clamps
    cfg2, prob2, grid2 = _problem("problems/2d/mbb_beam.json", (12, 6))
    assert mg.max_feasible_coarsenings(grid2) == 1
    rho2 = jnp.asarray(rng.uniform(0.1, 1.0, size=grid2.dims))
    u_direct2 = solvers.dense_solve(prob2.young(rho2), prob2.K0,
                                    prob2.dirichlet_mask, prob2.force, grid2)
    st2 = mg.MGSolverSettings(num_levels=3, cg_iter=300, tol=1e-10)
    u_mg2, _ = mg.make_mg_solver(prob2, st2)(rho2, None)
    np.testing.assert_allclose(np.asarray(u_mg2), np.asarray(u_direct2),
                               atol=1e-7)


def test_mgpcg_iteration_count_envelope():
    """At the reference's production settings (tol=1e-4, FMG, 2 smooths)
    the solve should converge in a handful of CG iterations even with
    strong density contrast (MGBenchmark-style check)."""
    from ndr_tpu.ops import filters as flt

    cfg, prob, grid = _problem("problems/2d/mbb_beam.json", (32, 16))
    rng = np.random.default_rng(5)
    # polarized-but-structured density field (raw salt-and-pepper noise is
    # not a realistic TO state — optimization always runs behind a
    # smoothing filter, as in the reference pipeline)
    raw = jnp.asarray(np.where(rng.uniform(size=grid.dims) < 0.5, 0.02, 1.0))
    rho = flt.SmoothingFilter(radius=2).apply(raw)
    settings = mg.MGSolverSettings(num_levels=2, cg_iter=100, tol=1e-4)
    solve = mg.make_mg_solver(prob, settings)
    u, iters = solve(rho, None)
    assert int(iters) <= 15
    # residual actually meets the tolerance
    young = prob.young(rho)
    r = prob.zero_dirichlet(prob.force) - prob.zero_dirichlet(
        ops.apply_k(u, young, prob.K0, grid)
    )
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(prob.zero_dirichlet(prob.force)))
    assert rel <= 1e-4


def test_color_masks_partition_grid():
    """Parity-color classes tile the node grid exactly once, and nodes of
    one color never share an element (the smoother's race-freedom
    invariant; reference: debugMulticolorVisit, MultigridSolver.hh:328-334)."""
    for dims in [(6, 4), (4, 4, 2)]:
        from ndr_tpu.grid import make_grid

        grid = make_grid(dims)
        masks = mg._parity_color_masks(grid)
        # exact partition
        np.testing.assert_array_equal(masks.sum(axis=0), 1)
        # independence: same-color nodes are >= 2 apart in some... in every
        # shared-element sense: their infinity-distance is >= 2
        ndim = grid.ndim
        for m in masks:
            idx = np.argwhere(m)
            if len(idx) < 2:
                continue
            # nearest same-color neighbor along each axis is 2 away
            for d in range(ndim):
                ax = np.unique(idx[:, d])
                if len(ax) > 1:
                    assert np.diff(ax).min() >= 2


def test_transfer_level_apply_matches_cached():
    """Levels above the Ke-cache limit apply R K_parent P; must equal the
    materialized Galerkin operator and keep MGPCG exact."""
    cfg, prob, grid = _problem("problems/2d/mbb_beam.json", (16, 8))
    rng = np.random.default_rng(7)
    rho = jnp.asarray(rng.uniform(0.1, 1.0, size=grid.dims))
    young = prob.young(rho)

    # force level 1 into transfer mode (level 2 = coarsest stays cached)
    mgc_t = mg.build_mg_config(prob, 2, ke_cache_limit_bytes=1)
    mgc_c = mg.build_mg_config(prob, 2)
    assert mgc_t.level_kind(1) == "transfer" and mgc_c.level_kind(1) == "cached"

    lv_t = mg.build_level_states(mgc_t, prob, young)
    lv_c = mg.build_level_states(mgc_c, prob, young)
    u = jnp.asarray(rng.standard_normal(lv_t[1].grid.nodes_per_dim + (2,)))
    f_t = mg._apply_k_level(lv_t[1], u)
    f_c = mg._apply_k_level(lv_c[1], u)
    np.testing.assert_allclose(np.asarray(f_t), np.asarray(f_c), atol=1e-10)
    # smoother diagonals agree as well
    np.testing.assert_allclose(
        np.asarray(lv_t[1].Minv_rows), np.asarray(lv_c[1].Minv_rows), atol=1e-10
    )

    # end-to-end: MGPCG with the transfer level matches the direct solve
    u_direct = solvers.dense_solve(young, prob.K0, prob.dirichlet_mask,
                                   prob.force, grid)
    st = mg.MGSolverSettings(num_levels=2, cg_iter=100, tol=1e-10,
                             ke_cache_limit_bytes=1)
    u_mg, iters = mg.make_mg_solver(prob, st)(rho, None)
    np.testing.assert_allclose(np.asarray(u_mg), np.asarray(u_direct), atol=1e-7)


def test_fp32_coarse_factorization_near_singular_grids():
    """Galerkin coarse K can be indefinite at fp32 machine precision when
    few Dirichlet pins survive coarsening (MBB's single corner support):
    observed min-eig ~ -2e-6 on the 18x6 coarse grid of a 36x12 fine run,
    NaN-ing the Cholesky and the whole solve. The relative Tikhonov guard
    in factor_coarsest must keep every solve finite."""
    for dims in [(36, 12), (30, 10)]:
        cfg, prob, grid = _problem("problems/2d/mbb_beam.json", dims)
        prob32 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, prob)
        st = mg.MGSolverSettings(num_levels=1, cg_iter=150, tol=1e-4,
                                 mixed_precision=False)
        solve = mg.make_mg_solver(prob32, st)
        rho = jnp.full(grid.dims, 0.3, jnp.float32)
        u, iters = solve(rho, jnp.zeros(prob32.force.shape, jnp.float32))
        assert np.isfinite(np.asarray(u)).all(), dims
        # and the solve actually converged to a sane equilibrium
        u64 = solvers.dense_solve(prob.young(rho.astype(jnp.float64)),
                                  prob.K0, prob.dirichlet_mask,
                                  prob.force, grid)
        c32 = float(jnp.vdot(prob32.force, u))
        c64 = float(jnp.vdot(prob.force, u64))
        assert abs(c32 - c64) / abs(c64) < 5e-3, dims


def test_recursive_galerkin_ke_matches_direct():
    """coarsen_ke (recursive, tiny constants) must equal the direct
    deep-coarsened-stack construction: trilinear spaces are nested so
    P_{0->l} = P_{0->l-1} P_{l-1->l} exactly."""
    cfg = load_problem("problems/3d/cantilever_flexion.json")
    prob, grid = problem_from_config(cfg, dims=(16, 8, 8), dtype=jnp.float64)
    mcfg = mg.build_mg_config(prob, 3)
    rng = np.random.default_rng(3)
    young = jnp.asarray(rng.uniform(1e-4, 1.0, grid.dims))
    for l in (2, 3):
        direct = mg.build_level_ke(mcfg, young, l)
        rec = mg.coarsen_ke(mg.build_level_ke(mcfg, young, l - 1), 3)
        err = float(jnp.abs(rec - direct).max() / jnp.abs(direct).max())
        assert err < 1e-12, (l, err)


@pytest.mark.parametrize("prob_path,dims,levels", [
    ("problems/2d/mbb_beam.json", (10, 6), 0),
    ("problems/2d/mbb_beam.json", (12, 6), 1),   # odd coarse dims exercise
    ("problems/3d/cantilever_flexion.json", (6, 4, 4), 1),
])
def test_incremental_gs_sweep_matches_naive(prob_path, dims, levels):
    """The incremental-residual sweep (apply_k_parity fast path) must
    reproduce the naive formulation — full r = b - K u before every
    color — to machine precision, on fine AND cached (Galerkin) levels."""
    cfg, prob, grid = _problem(prob_path, dims)
    rng = np.random.default_rng(11)
    rho = jnp.asarray(rng.uniform(0.2, 1.0, size=grid.dims))
    young = prob.young(rho)
    mgc = mg.build_mg_config(prob, levels)
    lvs = mg.build_level_states(mgc, prob, young)
    lv = lvs[levels]          # the deepest level (cached when levels > 0)

    b = mg._zero_dirichlet(
        lv, jnp.asarray(rng.normal(size=lv.grid.nodes_per_dim
                                   + (grid.ndim,))))
    u0 = mg._zero_dirichlet(
        lv, jnp.asarray(rng.normal(size=b.shape)))

    def naive_sweep(u, forward):
        n_colors = lv.color_masks.shape[0]
        order = range(n_colors) if forward else range(n_colors - 1, -1, -1)
        for c in order:
            r = b - mg._apply_k_level(lv, u)
            u = u + mg._gs_trisolve_color(lv, r, c, forward)
        return u

    for forward in (True, False):
        fast = mg.gs_sweep(lv, u0, b, forward=forward)
        ref = naive_sweep(u0, forward)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(ref), rtol=1e-11, atol=1e-11)


def test_coarse_solver_auto_gate_on_dofs():
    """"auto" must pick Newton-Schulz only when the coarsest system is
    small enough that 30 dense n^3 matmul pairs beat a cho_factor; at the
    2D MBB mgl=2 coarsest (75x25 elements = 3,952 DoFs) NS costs ~0.2 s
    per hierarchy rebuild and regressed the driver bench 14x (BENCH_r04).
    float64 hierarchies always use the exact Cholesky parity path."""
    # small 3-D coarsest (9x5x5 nodes = 675 DoFs at the 256-class point)
    cfg, prob, grid = _problem("problems/3d/cantilever_flexion.json",
                               (16, 8, 8))
    prob32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, prob)
    rho = jnp.full(grid.dims, 0.5, jnp.float32)
    mgc = mg.build_mg_config(prob32, 1)
    levels = mg.build_level_states(mgc, prob32, prob32.young(rho),
                                   smoother="chebyshev", power_iters=0)
    auto = mg.MGSolverSettings(num_levels=1, coarse_solver="auto")
    assert levels[-1].grid.num_nodes * 3 == 675
    assert mg._resolve_coarse_solver(auto, levels) == "ns"

    # large 2-D coarsest: the 2D MBB at mgl=2 -> 75x25 elems, 3952 DoFs
    cfg2, prob2, grid2 = _problem("problems/2d/mbb_beam.json", None)
    prob2_32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, prob2)
    rho2 = jnp.full(grid2.dims, 0.3, jnp.float32)
    mgc2 = mg.build_mg_config(prob2_32, 2)
    levels2 = mg.build_level_states(mgc2, prob2_32, prob2_32.young(rho2),
                                    smoother="chebyshev", power_iters=0)
    ndofs2 = levels2[-1].grid.num_nodes * 2
    assert ndofs2 == 3952, ndofs2
    assert mg._resolve_coarse_solver(auto, levels2) == "cholesky"

    # float64 hierarchies stay on the exact parity path regardless of size
    levels64 = mg.build_level_states(mg.build_mg_config(prob, 1), prob,
                                     prob.young(rho.astype(jnp.float64)),
                                     smoother="chebyshev", power_iters=0)
    assert mg._resolve_coarse_solver(auto, levels64) == "cholesky"


def test_newton_schulz_coarse_inverse():
    """The matmul-only Newton-Schulz coarsest inverse must (a) solve the
    coarsest system to preconditioner-quality accuracy vs the Cholesky
    factorization it replaces, and (b) leave the end-to-end MGPCG
    solution and iteration count essentially unchanged."""
    cfg, prob, grid = _problem("problems/3d/cantilever_flexion.json",
                               (16, 8, 8))
    prob32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, prob)
    rng = np.random.default_rng(7)
    rho = jnp.asarray(rng.uniform(0.05, 1.0, size=grid.dims), jnp.float32)
    mgc = mg.build_mg_config(prob32, 2)
    levels = mg.build_level_states(mgc, prob32, prob32.young(rho),
                                   smoother="chebyshev", power_iters=0)

    kind_c, chol = mg.factor_coarsest(levels, "cholesky")
    kind_n, X = mg.factor_coarsest(levels, "ns")
    assert (kind_c, kind_n) == ("chol", "ns")

    lvc = levels[-1]
    b = jnp.asarray(
        rng.standard_normal(lvc.grid.nodes_per_dim + (grid.ndim,)),
        jnp.float32)
    x_cho = mg._coarse_solve(lvc, ("chol", chol), b)
    x_ns = mg._coarse_solve(lvc, ("ns", X), b)
    err = float(jnp.linalg.norm((x_ns - x_cho).reshape(-1))
                / jnp.linalg.norm(x_cho.reshape(-1)))
    assert err < 1e-3, err

    # X is symmetric (a polynomial in the Jacobi-scaled K, congruence-
    # transformed back) -- required for the MG preconditioner to stay SPD
    sym = float(jnp.max(jnp.abs(X - X.T)) / jnp.max(jnp.abs(X)))
    assert sym < 1e-5, sym

    us, its = {}, {}
    for cs in ("cholesky", "ns"):
        st = mg.MGSolverSettings(num_levels=2, cg_iter=100, tol=1e-6,
                                 smoother="chebyshev", lmax_power_iters=0,
                                 mixed_precision=False, coarse_solver=cs)
        u, iters = mg.make_mg_solver(prob32, st)(rho, None)
        us[cs], its[cs] = u, int(iters)
    np.testing.assert_allclose(np.asarray(us["ns"]),
                               np.asarray(us["cholesky"]),
                               atol=2e-5 * float(jnp.max(jnp.abs(us["cholesky"]))))
    assert its["ns"] <= its["cholesky"] + 1, its


def test_lagged_precond_solves_current_operator():
    """A hierarchy built at an EARLIER density must still drive the solve
    to the solution of the CURRENT operator: the precond only lags, the
    CG operator is exact (multigrid.mgpcg_solve precond_state)."""
    cfg, prob, grid = _problem("problems/3d/cantilever_flexion.json",
                               (16, 8, 8))
    rng = np.random.default_rng(3)
    rho0 = jnp.full(grid.dims, 0.4, prob.force.dtype)
    # one OC-sized density drift (move limit 0.2)
    rho1 = jnp.clip(
        rho0 + jnp.asarray(rng.uniform(-0.2, 0.2, grid.dims),
                           prob.force.dtype), 0.05, 1.0)

    settings = mg.MGSolverSettings(
        num_levels=2, cg_iter=300, tol=1e-10, smoother="chebyshev",
        lmax_power_iters=0, mixed_precision=False)
    solve = mg.make_mg_solver(prob, settings)

    leaves = jax.jit(solve.build_precond)(rho0)
    u_lag, it_lag = jax.jit(
        lambda r, p: solve(r, None, precond=p))(rho1, leaves)
    u_ref, it_ref = solve(rho1, None)
    np.testing.assert_allclose(
        np.asarray(u_lag), np.asarray(u_ref),
        atol=1e-8 * float(jnp.max(jnp.abs(u_ref))))
    # the extreme drift above (up to 27x SIMP modulus change per voxel)
    # degrades the stale precond but must never stall CG
    assert int(it_lag) < settings.cg_iter, (int(it_lag), int(it_ref))

    # at realistic OC per-step drift, staleness is near iteration-neutral
    rho_s = jnp.clip(
        rho0 + jnp.asarray(rng.uniform(-0.03, 0.03, grid.dims),
                           prob.force.dtype), 0.05, 1.0)
    _, it_s = jax.jit(lambda r, p: solve(r, None, precond=p))(rho_s, leaves)
    _, it_fs = solve(rho_s, None)
    # tol=1e-10 magnifies the cost (production runs at 1e-5..1e-6 see
    # less); a handful of extra iterations is the expected envelope
    assert int(it_s) <= int(it_fs) + 5, (int(it_s), int(it_fs))


def test_lagged_precond_refined_path():
    """Same invariant through the mixed-precision refinement driver
    (fp32 problem + float64 true residual)."""
    cfg, prob, grid = _problem("problems/3d/cantilever_flexion.json",
                               (16, 8, 8))
    prob32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, prob)
    rng = np.random.default_rng(4)
    rho0 = jnp.full(grid.dims, 0.4, jnp.float32)
    rho1 = jnp.clip(
        rho0 + jnp.asarray(rng.uniform(-0.2, 0.2, grid.dims), jnp.float32),
        0.05, 1.0)

    settings = mg.MGSolverSettings(
        num_levels=2, cg_iter=300, tol=1e-6, smoother="chebyshev",
        lmax_power_iters=0, mixed_precision=True)
    solve = mg.make_mg_solver(prob32, settings)

    leaves = jax.jit(solve.build_precond)(rho0)
    u_lag, _ = jax.jit(lambda r, p: solve(r, None, precond=p))(rho1, leaves)
    u_ref, _ = solve(rho1, None)
    assert u_lag.dtype == u_ref.dtype == jnp.float64
    # both satisfy ||b - K u|| <= tol ||b|| on the SAME (current) operator
    np.testing.assert_allclose(
        np.asarray(u_lag), np.asarray(u_ref),
        atol=2e-5 * float(jnp.max(jnp.abs(u_ref))))


def test_lagged_precond_transfer_levels():
    """Lag leaves round-trip through a hierarchy containing TRANSFER
    levels (ke_cache_limit_bytes=0 forces every intermediate level to the
    restrict-apply-prolong form — the prod_kelim production variant):
    transfer levels carry no Ke leaves, so the packing must stay
    consistent."""
    cfg, prob, grid = _problem("problems/3d/cantilever_flexion.json",
                               (16, 8, 8))
    rng = np.random.default_rng(7)
    rho = jnp.asarray(rng.uniform(0.2, 1.0, grid.dims), prob.force.dtype)
    settings = mg.MGSolverSettings(
        num_levels=2, cg_iter=100, tol=1e-8, smoother="chebyshev",
        lmax_power_iters=0, mixed_precision=False,
        ke_cache_limit_bytes=0, coarse_solver="cholesky")
    solve = mg.make_mg_solver(prob, settings)
    kinds = [solve.cfg.level_kind(l) for l in range(solve.cfg.num_levels)]
    assert "transfer" in kinds
    leaves = jax.jit(solve.build_precond)(rho)
    u_rt, it_rt = jax.jit(lambda r, p: solve(r, None, precond=p))(rho, leaves)
    u_fresh, it_fresh = solve(rho, None)
    np.testing.assert_allclose(
        np.asarray(u_rt), np.asarray(u_fresh),
        atol=1e-7 * float(jnp.max(jnp.abs(u_fresh))))
    assert int(it_rt) == int(it_fresh)
    # drifted density: stale transfer-level precond still converges
    rho2 = jnp.clip(rho + jnp.asarray(
        rng.uniform(-0.05, 0.05, grid.dims), prob.force.dtype), 0.05, 1.0)
    _, it_lag = jax.jit(lambda r, p: solve(r, None, precond=p))(rho2, leaves)
    assert int(it_lag) < settings.cg_iter


def test_lagged_precond_fine_refresh():
    """precond_refresh_fine rebuilds level-0's smoother state (young,
    Minv, Dinv) from the CURRENT density inside a lagged solve: at a
    drifted density it must never cost iterations vs the fully stale
    hierarchy, and at the leaves' own density it must reproduce the
    fresh solve (the refreshed level-0 recomputes to identical values)."""
    cfg, prob, grid = _problem("problems/3d/cantilever_flexion.json",
                               (16, 8, 8))
    rng = np.random.default_rng(11)
    rho0 = jnp.full(grid.dims, 0.4, prob.force.dtype)
    rho1 = jnp.clip(
        rho0 + jnp.asarray(rng.uniform(-0.2, 0.2, grid.dims),
                           prob.force.dtype), 0.05, 1.0)

    base = dict(num_levels=2, cg_iter=300, tol=1e-8,
                smoother="chebyshev", lmax_power_iters=0,
                mixed_precision=False)
    s_on = mg.MGSolverSettings(**base, precond_refresh_fine=True)
    s_off = mg.MGSolverSettings(**base, precond_refresh_fine=False)
    solve_on = mg.make_mg_solver(prob, s_on)
    solve_off = mg.make_mg_solver(prob, s_off)

    leaves = jax.jit(solve_on.build_precond)(rho0)
    # same-density: refresh recomputes identical level-0 state
    u_same, it_same = solve_on(rho0, None, precond=leaves)
    u_fresh, it_fresh = solve_on(rho0, None)
    np.testing.assert_allclose(
        np.asarray(u_same), np.asarray(u_fresh),
        atol=1e-9 * float(jnp.max(jnp.abs(u_fresh))))
    assert int(it_same) == int(it_fresh)

    # drifted density: refreshed-fine must not cost iterations vs stale
    u_on, it_on = jax.jit(
        lambda r, p: solve_on(r, None, precond=p))(rho1, leaves)
    u_off, it_off = jax.jit(
        lambda r, p: solve_off(r, None, precond=p))(rho1, leaves)
    assert int(it_on) <= int(it_off), (int(it_on), int(it_off))
    # both land on the current operator's solution
    u_ref, _ = solve_on(rho1, None)
    for u in (u_on, u_off):
        np.testing.assert_allclose(
            np.asarray(u), np.asarray(u_ref),
            atol=1e-6 * float(jnp.max(jnp.abs(u_ref))))


def test_leaves_roundtrip_identical_solve():
    """levels_from_leaves(template, precond_leaves(levels)) reproduces the
    fresh solve exactly when built at the same density."""
    cfg, prob, grid = _problem("problems/3d/cantilever_flexion.json",
                               (16, 8, 8))
    rng = np.random.default_rng(5)
    rho = jnp.asarray(rng.uniform(0.2, 1.0, grid.dims), prob.force.dtype)
    settings = mg.MGSolverSettings(
        num_levels=2, cg_iter=100, tol=1e-8, smoother="chebyshev",
        lmax_power_iters=0, mixed_precision=False)
    solve = mg.make_mg_solver(prob, settings)
    leaves = solve.build_precond(rho)
    u_rt, it_rt = solve(rho, None, precond=leaves)
    u_fresh, it_fresh = solve(rho, None)
    np.testing.assert_array_equal(np.asarray(u_rt), np.asarray(u_fresh))
    assert int(it_rt) == int(it_fresh)


def test_oc_chunked_lag_tracks_fresh_trajectory():
    """OC steps with a preconditioner rebuilt every k steps track the
    rebuild-every-step trajectory (both solves converge to tol on the
    exact operator, so OC sees near-identical gradients).

    Tolerance note: within-solver-tol displacement differences amplify
    ~100x per step through this toy problem's aggressive early OC phase
    (compliance drops 60% in 4 steps; the lambda bisection branches on
    tiny gradient perturbations). Measured: tol=1e-8 solves give step-4
    relative deviation ~1.6e-3 and tol=1e-11 gives ~1.7e-4 — the
    deviation scales with solver tolerance, i.e. it is noise
    amplification, not preconditioner bias. Steps 1-3 are asserted
    tight; step 4 gets the amplification envelope. (Production-scale
    parity evidence: logs/c256_full.log vs c1001.log.)"""
    from ndr_tpu.fem import topopt
    from ndr_tpu.ops import filters as flt

    cfg, prob, grid = _problem("problems/3d/cantilever_flexion.json",
                               (16, 8, 8))
    settings = mg.MGSolverSettings(
        num_levels=2, cg_iter=200, tol=1e-8, smoother="chebyshev",
        lmax_power_iters=0, mixed_precision=False)
    solve = mg.make_mg_solver(prob, settings)
    top = topopt.TopologyOptimizationProblem(
        prob=prob,
        filters=[flt.SmoothingFilter(radius=1),
                 flt.ProjectionFilter(beta=1.0)],
        max_volume=cfg.max_volume,
        solve=solve,
    )
    x0 = jnp.full(grid.dims, cfg.max_volume, prob.force.dtype)

    # fresh: rebuild every step (the default path)
    s = topopt.oc_init(top, x0)
    cs_fresh = []
    for _ in range(4):
        s, metr = topopt.oc_step(top, s)
        cs_fresh.append(float(metr["compliance"]))

    # lagged: one precond for all 4 steps (k = 4)
    s = topopt.oc_init(top, x0)
    leaves = solve.build_precond(top.physical_density(s.x))
    cs_lag = []
    for _ in range(4):
        s, metr = topopt.oc_step(top, s, precond=leaves)
        cs_lag.append(float(metr["compliance"]))

    np.testing.assert_allclose(cs_lag[:3], cs_fresh[:3], rtol=1e-5)
    np.testing.assert_allclose(cs_lag, cs_fresh, rtol=2e-2)
