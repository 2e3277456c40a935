"""Sharded (multi-chip) solver tests against single-device oracles.

The virtual 8-device CPU platform needs
``--xla_force_host_platform_device_count`` which must not leak into the
main test process (it makes every CPU compile pathologically slow), so
each test body runs in a subprocess with its own XLA_FLAGS.
"""

import os
import subprocess
import sys
import textwrap

import pytest


def _run_in_multidevice_subprocess(body: str, n_devices: int = 4,
                                   x64: bool = False):
    """Execute `body` (python source) under an n-device CPU platform."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices} "
        + env.get("XLA_FLAGS", "")
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "1" if x64 else "0"
    prelude = textwrap.dedent(
        f"""
        import jax
        # the ambient environment pins JAX_PLATFORMS to the TPU plugin in a
        # way env vars can't override; request virtual CPU devices via
        # config before any backend initializes (cf. __graft_entry__)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", {n_devices})
        jax.config.update("jax_enable_x64", {x64})
        assert jax.device_count() == {n_devices}, jax.devices()
        """
    ) + textwrap.dedent(
        """
        import jax.numpy as jnp
        import numpy as np
        from functools import partial
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        from ndr_tpu.fem import multigrid as mg
        from ndr_tpu.fem import operators as ops
        from ndr_tpu.fem import solvers
        from ndr_tpu.fem.simulator import problem_from_config
        from ndr_tpu.io.problem import load_problem
        from ndr_tpu.parallel import mesh as pmesh
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", prelude + textwrap.dedent(body)],
        env=env, capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, (
        f"subprocess failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    return proc.stdout


def test_sharded_apply_k_matches_unsharded():
    """halo-summed slab applyK == global applyK (the §2.3/§5.8 oracle)."""
    _run_in_multidevice_subprocess(
        """
        n = 4
        cfg = load_problem("problems/3d/bridge.json")
        prob, grid = problem_from_config(cfg, dims=(16, 8, 4),
                                         dtype=jnp.float32)
        sg = pmesh.ShardedGrid(global_grid=grid, num_shards=n)
        mesh = pmesh.make_mesh(n)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal(grid.nodes_per_dim + (3,)),
                        jnp.float32)
        rho = jnp.asarray(rng.uniform(0.05, 1.0, grid.dims), jnp.float32)
        young = prob.young(rho)

        f_ref = ops.apply_k(u, young, jnp.asarray(prob.K0, jnp.float32), grid)

        apply_shard = pmesh.make_sharded_apply_k(sg, np.asarray(prob.K0))

        def one(u_l, y_l):
            return apply_shard(u_l[0], y_l[0])[None]

        f = shard_map(one, mesh=mesh,
                      in_specs=(P(pmesh.AXIS), P(pmesh.AXIS)),
                      out_specs=P(pmesh.AXIS))(
            pmesh.shard_node_field(u, sg)[:, None][:, 0],
            pmesh.shard_elem_field(young, sg))
        f_full = pmesh.unshard_node_field(f, sg)
        np.testing.assert_allclose(np.asarray(f_full), np.asarray(f_ref),
                                   rtol=2e-5, atol=2e-5)
        print("APPLY_OK")
        """
    )


def test_halo_overlap_apply_matches_force_exchange():
    """Input-pre-exchange apply (halo_overlap_apply: ppermute overlaps
    compute) == post-hoc force-exchange apply (halo_sum_forces), for both
    the matrix-free fine operator and a cached-Ke Galerkin operator."""
    _run_in_multidevice_subprocess(
        """
        n = 4
        cfg = load_problem("problems/3d/bridge.json")
        prob, grid = problem_from_config(cfg, dims=(16, 8, 4),
                                         dtype=jnp.float32)
        sg = pmesh.ShardedGrid(global_grid=grid, num_shards=n)
        mesh = pmesh.make_mesh(n)
        lg = sg.local_grid
        sg0 = lg.with_dims((1,) + lg.dims[1:])
        rng = np.random.default_rng(2)
        u = jnp.asarray(rng.standard_normal(grid.nodes_per_dim + (3,)),
                        jnp.float32)
        rho = jnp.asarray(rng.uniform(0.05, 1.0, grid.dims), jnp.float32)
        young = prob.young(rho)
        K0 = jnp.asarray(prob.K0, jnp.float32)

        # fine matrix-free operator
        def both_fine(u_l, y_l):
            u_l, y_l = u_l[0], y_l[0]
            f_sum = pmesh.halo_sum_forces(ops.apply_k(u_l, y_l, K0, lg))
            f_ovl = pmesh.halo_overlap_apply(
                u_l, y_l[:1], y_l[-1:],
                lambda v: ops.apply_k(v, y_l, K0, lg),
                lambda u2, p: ops.apply_k(u2, p, K0, sg0))
            return f_sum[None], f_ovl[None]

        fs, fo = shard_map(both_fine, mesh=mesh,
                           in_specs=(P(pmesh.AXIS), P(pmesh.AXIS)),
                           out_specs=(P(pmesh.AXIS), P(pmesh.AXIS)))(
            pmesh.shard_node_field(u, sg),
            pmesh.shard_elem_field(young, sg))
        np.testing.assert_allclose(np.asarray(fo), np.asarray(fs),
                                   rtol=1e-6, atol=1e-6)

        # cached-Ke operator (per-element stiffness stack)
        def both_cached(u_l, y_l):
            u_l, y_l = u_l[0], y_l[0]
            Ke = jnp.einsum("...,de->...de", y_l,
                            K0, precision=jax.lax.Precision.HIGHEST)
            f_sum = pmesh.halo_sum_forces(ops.apply_k_cached(u_l, Ke, lg))
            f_ovl = pmesh.halo_overlap_apply(
                u_l, Ke[:1], Ke[-1:],
                lambda v: ops.apply_k_cached(v, Ke, lg),
                lambda u2, p: ops.apply_k_cached(u2, p, sg0))
            return f_sum[None], f_ovl[None]

        fs, fo = shard_map(both_cached, mesh=mesh,
                           in_specs=(P(pmesh.AXIS), P(pmesh.AXIS)),
                           out_specs=(P(pmesh.AXIS), P(pmesh.AXIS)))(
            pmesh.shard_node_field(u, sg),
            pmesh.shard_elem_field(young, sg))
        np.testing.assert_allclose(np.asarray(fo), np.asarray(fs),
                                   rtol=1e-6, atol=1e-6)
        print("OVERLAP_OK")
        """
    )


def test_sharded_transfer_operators_match_unsharded():
    """restrict_sharded / prolong_sharded == global restrict/prolongate."""
    _run_in_multidevice_subprocess(
        """
        n = 4
        cfg = load_problem("problems/3d/bridge.json")
        prob, grid = problem_from_config(cfg, dims=(16, 8, 4),
                                         dtype=jnp.float32)
        sg = pmesh.ShardedGrid(global_grid=grid, num_shards=n)
        cgrid = grid.coarsened()
        sgc = pmesh.ShardedGrid(global_grid=cgrid, num_shards=n)
        mesh = pmesh.make_mesh(n)
        rng = np.random.default_rng(1)
        r = jnp.asarray(rng.standard_normal(grid.nodes_per_dim + (3,)),
                        jnp.float32)
        uc = jnp.asarray(rng.standard_normal(cgrid.nodes_per_dim + (3,)),
                         jnp.float32)

        r_c_ref = mg.restrict(r, 3)
        u_f_ref = mg.prolongate(uc, 3)

        def rest(r_l):
            return pmesh.restrict_sharded(r_l[0], 3)[None]

        def prol(u_l):
            return pmesh.prolong_sharded(u_l[0], 3)[None]

        r_c = shard_map(rest, mesh=mesh, in_specs=P(pmesh.AXIS),
                        out_specs=P(pmesh.AXIS))(pmesh.shard_node_field(r, sg))
        u_f = shard_map(prol, mesh=mesh, in_specs=P(pmesh.AXIS),
                        out_specs=P(pmesh.AXIS))(pmesh.shard_node_field(uc, sgc))
        np.testing.assert_allclose(
            np.asarray(pmesh.unshard_node_field(r_c, sgc)),
            np.asarray(r_c_ref), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(pmesh.unshard_node_field(u_f, sg)),
            np.asarray(u_f_ref), rtol=2e-5, atol=2e-5)
        print("TRANSFER_OK")
        """
    )


def test_sharded_mgpcg_matches_dense_oracle():
    """Full sharded MGPCG (Galerkin levels + Chebyshev smoothing +
    all-gathered coarse Cholesky) converges to the dense-solve
    displacement on a 3D problem."""
    _run_in_multidevice_subprocess(
        """
        n = 4
        cfg = load_problem("problems/3d/bridge.json")
        prob, grid = problem_from_config(cfg, dims=(16, 8, 8),
                                         dtype=jnp.float32)
        sg = pmesh.ShardedGrid(global_grid=grid, num_shards=n)
        mesh = pmesh.make_mesh(n)
        rng = np.random.default_rng(2)
        rho = jnp.asarray(rng.uniform(0.3, 1.0, grid.dims), jnp.float32)

        solve = pmesh.make_sharded_mgpcg(sg, prob, num_levels=1,
                                         tol=1e-7, max_iter=200)

        def one(u0_l, rho_l, b_l):
            x, iters = solve(u0_l[0], rho_l[0], b_l[0])
            return x[None], iters

        shsolve = shard_map(
            one, mesh=mesh,
            in_specs=(P(pmesh.AXIS), P(pmesh.AXIS), P(pmesh.AXIS)),
            out_specs=(P(pmesh.AXIS), P()))

        b = prob.zero_dirichlet(prob.force).astype(jnp.float32)
        u_slabs, iters = jax.jit(shsolve)(
            pmesh.shard_node_field(jnp.zeros_like(b), sg),
            pmesh.shard_elem_field(rho, sg),
            pmesh.shard_node_field(b, sg))
        u = np.asarray(pmesh.unshard_node_field(u_slabs, sg))

        u_ref = np.asarray(solvers.dense_solve(
            prob.young(rho.astype(jnp.float64)), np.asarray(prob.K0),
            prob.dirichlet_mask, prob.force.astype(jnp.float64), grid))
        err = np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref)
        assert err < 1e-4, f"relative error {err}"
        assert int(iters) < 60, f"MGPCG took {int(iters)} iters"
        # duplicated boundary planes consistent across shards
        s = np.asarray(u_slabs)
        for i in range(1, n):
            np.testing.assert_allclose(s[i][0], s[i-1][-1], rtol=1e-6,
                                       atol=1e-7)
        print("MGPCG_OK", int(iters), err)
        """
    )


def test_sharded_mgpcg_two_levels_high_contrast():
    """Two coarsenings + SIMP-like modulus contrast (E in [Emin, 1])."""
    _run_in_multidevice_subprocess(
        """
        n = 2
        cfg = load_problem("problems/3d/bridge.json")
        prob, grid = problem_from_config(cfg, dims=(16, 8, 8),
                                         dtype=jnp.float32)
        sg = pmesh.ShardedGrid(global_grid=grid, num_shards=n)
        mesh = pmesh.make_mesh(n)
        rng = np.random.default_rng(3)
        # hardened design: near-binary densities
        rho = jnp.asarray((rng.uniform(0, 1, grid.dims) > 0.5) * 0.999
                          + 0.001, jnp.float32)

        solve = pmesh.make_sharded_mgpcg(sg, prob, num_levels=2,
                                         tol=1e-6, max_iter=300)

        def one(u0_l, rho_l, b_l):
            x, iters = solve(u0_l[0], rho_l[0], b_l[0])
            return x[None], iters

        shsolve = shard_map(
            one, mesh=mesh,
            in_specs=(P(pmesh.AXIS), P(pmesh.AXIS), P(pmesh.AXIS)),
            out_specs=(P(pmesh.AXIS), P()))

        b = prob.zero_dirichlet(prob.force).astype(jnp.float32)
        u_slabs, iters = jax.jit(shsolve)(
            pmesh.shard_node_field(jnp.zeros_like(b), sg),
            pmesh.shard_elem_field(rho, sg),
            pmesh.shard_node_field(b, sg))
        u = np.asarray(pmesh.unshard_node_field(u_slabs, sg))
        u_ref = np.asarray(solvers.dense_solve(
            prob.young(rho.astype(jnp.float64)), np.asarray(prob.K0),
            prob.dirichlet_mask, prob.force.astype(jnp.float64), grid))
        err = np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref)
        assert err < 1e-3, f"relative error {err}"
        print("MGPCG2_OK", int(iters), err)
        """,
        n_devices=2,
    )


def test_sharded_refined_solver_matches_dense_oracle():
    """Driver-facing sharded SolveFn (make_sharded_solver) with float64
    iterative refinement: the global-array API used by
    `train_voxelfem --shards N`. Must reach the dense-f64 oracle to the
    refinement tolerance, well beyond plain fp32 accuracy."""
    _run_in_multidevice_subprocess(
        """
        n = 4
        cfg = load_problem("problems/3d/bridge.json")
        prob, grid = problem_from_config(cfg, dims=(16, 8, 8),
                                         dtype=jnp.float32)
        rng = np.random.default_rng(5)
        rho = jnp.asarray(rng.uniform(0.05, 1.0, grid.dims), jnp.float32)

        solve = pmesh.make_sharded_solver(
            prob, num_shards=n, num_levels=1, tol=1e-9, max_iter=300,
            mixed_precision=True)
        u, iters = solve(rho)
        u = np.asarray(u)
        assert u.dtype == np.float64, u.dtype

        u_ref = np.asarray(solvers.dense_solve(
            prob.young(rho.astype(jnp.float64)), np.asarray(prob.K0),
            prob.dirichlet_mask, prob.force.astype(jnp.float64), grid))
        err = np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref)
        # fp32 alone bottoms out ~1e-4 relative on these systems; the
        # refinement must go far below that
        assert err < 1e-7, f"relative error {err}"
        print("REFINED_OK", int(iters), err)
        """,
        x64=True,
    )


def test_sharded_classic_oc_matches_single_device():
    """`ground_truth_topopt(shards=N)` — the full classic OC step over
    the slab decomposition — reproduces the single-device trajectory."""
    _run_in_multidevice_subprocess(
        """
        from ndr_tpu.training.classic import ground_truth_topopt
        cfg = load_problem("problems/3d/bridge.json")
        kw = dict(dims=(16, 8, 8), max_iter=4, multigrid_levels=1,
                  tol=1e-6, log=lambda s: None)
        r1 = ground_truth_topopt(cfg, **kw)
        rN = ground_truth_topopt(cfg, shards=4, **kw)
        h1 = np.asarray(r1.history)
        hN = np.asarray(rN.history)
        err = np.abs(h1 - hN) / np.abs(h1)
        assert err.max() < 1e-4, (h1, hN)
        print("SHARDED_OC_OK", h1[-1], hN[-1])
        """,
        x64=True,
    )


# ---------------------------------------------------------------------------
# 2-D pencil decomposition (mesh.make_sharded_mgpcg_2d)
# ---------------------------------------------------------------------------


def test_sharded2d_apply_and_vdot_match_global():
    """Composed x-then-y force halo sums complete corner contributions
    transitively: the 2-D-sharded applyK equals the global applyK, and
    psum_vdot_2d equals the global dot product."""
    _run_in_multidevice_subprocess(
        """
        cfg = load_problem("problems/3d/bridge.json")
        prob, grid = problem_from_config(cfg, dims=(8, 8, 4),
                                         dtype=jnp.float32)
        sg = pmesh.ShardedGrid2D(global_grid=grid, shards_x=2, shards_y=2)
        mesh = pmesh.make_mesh_2d(2, 2)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal(grid.nodes_per_dim + (3,)),
                        jnp.float32)
        rho = jnp.asarray(rng.uniform(0.05, 1.0, grid.dims), jnp.float32)
        young = prob.young(rho)
        K0 = np.asarray(prob.K0)

        f_ref = ops.apply_k(u, young, jnp.asarray(K0, jnp.float32), grid)
        dot_ref = float(jnp.vdot(u, f_ref,
                                 precision=jax.lax.Precision.HIGHEST))

        def one(u_l, y_l):
            lg = sg.local_grid
            f = pmesh.halo_sum_forces_2d(
                ops.apply_k(u_l[0, 0], y_l[0, 0],
                            jnp.asarray(K0, jnp.float32), lg))
            d = pmesh.psum_vdot_2d(u_l[0, 0], f)
            return f[None, None], d

        f, d = shard_map(
            one, mesh=mesh,
            in_specs=(P(pmesh.AXIS, pmesh.AXIS_Y),
                      P(pmesh.AXIS, pmesh.AXIS_Y)),
            out_specs=(P(pmesh.AXIS, pmesh.AXIS_Y), P()))(
            pmesh.shard_node_field_2d(u, sg),
            pmesh.shard_elem_field_2d(young, sg))
        f_full = pmesh.unshard_node_field_2d(f, sg)
        np.testing.assert_allclose(np.asarray(f_full), np.asarray(f_ref),
                                   rtol=2e-5, atol=2e-5)
        assert abs(float(d) - dot_ref) <= 2e-4 * abs(dot_ref), (
            float(d), dot_ref)
        print("APPLY2D_OK")
        """
    )


def test_sharded2d_mgpcg_matches_dense_oracle():
    """Full 2-D-sharded MGPCG (Galerkin level + Chebyshev + all-gathered
    coarse solve over both mesh axes) converges to the dense-solve
    displacement; duplicated planes stay consistent along both axes."""
    _run_in_multidevice_subprocess(
        """
        cfg = load_problem("problems/3d/bridge.json")
        prob, grid = problem_from_config(cfg, dims=(8, 8, 4),
                                         dtype=jnp.float32)
        sg = pmesh.ShardedGrid2D(global_grid=grid, shards_x=2, shards_y=2)
        mesh = pmesh.make_mesh_2d(2, 2)
        rng = np.random.default_rng(2)
        rho = jnp.asarray(rng.uniform(0.3, 1.0, grid.dims), jnp.float32)

        solve = pmesh.make_sharded_mgpcg_2d(sg, prob, num_levels=1,
                                            tol=1e-7, max_iter=200)

        def one(u0_l, rho_l, b_l):
            x, iters = solve(u0_l[0, 0], rho_l[0, 0], b_l[0, 0])
            return x[None, None], iters

        shsolve = shard_map(
            one, mesh=mesh,
            in_specs=(P(pmesh.AXIS, pmesh.AXIS_Y),) * 3,
            out_specs=(P(pmesh.AXIS, pmesh.AXIS_Y), P()))

        b = prob.zero_dirichlet(prob.force).astype(jnp.float32)
        u_slabs, iters = jax.jit(shsolve)(
            pmesh.shard_node_field_2d(jnp.zeros_like(b), sg),
            pmesh.shard_elem_field_2d(rho, sg),
            pmesh.shard_node_field_2d(b, sg))
        u = np.asarray(pmesh.unshard_node_field_2d(u_slabs, sg))

        u_ref = np.asarray(solvers.dense_solve(
            prob.young(rho.astype(jnp.float64)), np.asarray(prob.K0),
            prob.dirichlet_mask, prob.force.astype(jnp.float64), grid))
        err = np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref)
        assert err < 1e-4, f"relative error {err}"
        assert int(iters) < 60, f"MGPCG took {int(iters)} iters"
        s = np.asarray(u_slabs)
        for i in range(2):
            np.testing.assert_allclose(s[1, i][0], s[0, i][-1],
                                       rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(s[i, 1][:, 0], s[i, 0][:, -1],
                                       rtol=1e-6, atol=1e-7)
        print("MGPCG2D_OK", int(iters), err)
        """
    )


def test_sharded2d_refined_solver_matches_dense_oracle():
    """The 2-D driver-facing SolveFn (f64 refinement around fp32 MGPCG,
    global arrays in/out) matches the dense f64 oracle."""
    _run_in_multidevice_subprocess(
        """
        cfg = load_problem("problems/3d/bridge.json")
        prob, grid = problem_from_config(cfg, dims=(8, 8, 4),
                                         dtype=jnp.float32)
        rng = np.random.default_rng(3)
        rho = jnp.asarray(rng.uniform(0.3, 1.0, grid.dims), jnp.float32)

        solve = pmesh.make_sharded_solver_2d(
            prob, 2, 2, num_levels=1, tol=1e-8, max_iter=200,
            mixed_precision=True)
        u, iters = jax.block_until_ready(solve(rho))
        u = np.asarray(u)

        prob64 = problem_from_config(cfg, dims=(8, 8, 4),
                                     dtype=jnp.float64)[0]
        u_ref = np.asarray(solvers.dense_solve(
            prob64.young(rho.astype(jnp.float64)), np.asarray(prob64.K0),
            prob64.dirichlet_mask, prob64.force, grid))
        err = np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref)
        assert err < 1e-6, f"relative error {err}"
        print("REFINED2D_OK", int(iters), err)
        """,
        x64=True,
    )
