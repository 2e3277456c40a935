"""Domain decomposition of the voxel grid over a TPU device mesh.

The reference is a single-node shared-memory code (TBB thread pools,
SURVEY.md §2.3/§5.8); its only parallelism is loop-level. The TPU-native
scaling axis is spatial domain decomposition: shard the voxel grid along
its leading dimension over a 1-D `jax.sharding.Mesh`, run the matrix-free
stiffness apply under `shard_map` with one-node halo exchange via
`jax.lax.ppermute` over ICI, and reduce CG dot products with `psum`.

Key design choice — **ghost-element replication**: each shard owns a
contiguous slab of elements plus one ghost element layer on each side
(and the corresponding nodes). applyK then needs only a *post-hoc halo
sum* of the boundary-node forces (one ppermute each way); gathers stay
local. Transfer operators, smoothers and dot products follow the same
pattern, so the entire MGPCG runs SPMD with communication only at slab
faces — the moral equivalent of MPI domain decomposition, but expressed
as shardings and XLA collectives.

This module provides the sharded applyK + CG building blocks used by
`__graft_entry__.dryrun_multichip` and scales to grids whose fields
exceed one chip's HBM.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST  # see fem.multigrid._HIGHEST note
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ndr_tpu.fem import operators as ops
from ndr_tpu.fem.simulator import FEMProblem
from ndr_tpu.grid import Grid


AXIS = "x"  # mesh axis name for the slab decomposition


@dataclasses.dataclass(frozen=True)
class ShardedGrid:
    """Static description of the slab decomposition.

    The global grid's leading element dimension is split into
    `num_shards` equal slabs (it must divide evenly — pad upstream if
    needed). Each shard stores `local_elems + 1` node planes plus one
    shared node plane duplicated between neighbors.
    """

    global_grid: Grid
    num_shards: int

    def __post_init__(self):
        if self.global_grid.dims[0] % self.num_shards:
            raise ValueError(
                f"leading dim {self.global_grid.dims[0]} not divisible by "
                f"{self.num_shards} shards"
            )

    @property
    def local_elems(self) -> int:
        return self.global_grid.dims[0] // self.num_shards

    @property
    def local_grid(self) -> Grid:
        return self.global_grid.with_dims(
            (self.local_elems,) + self.global_grid.dims[1:]
        )


def shard_node_field(u: jnp.ndarray, sg: ShardedGrid) -> jnp.ndarray:
    """Split a global node field into per-shard slabs with the shared
    boundary plane replicated: shard i holds node planes
    [i*L*d, (i+1)*L*d] inclusive (L = local elems, d = degree).

    Output shape: (num_shards, L*d+1, rest..., N).
    """
    d = sg.global_grid.degree
    L = sg.local_elems
    slabs = [u[i * L * d:(i + 1) * L * d + 1] for i in range(sg.num_shards)]
    return jnp.stack(slabs)


def unshard_node_field(slabs: jnp.ndarray, sg: ShardedGrid) -> jnp.ndarray:
    """Inverse of shard_node_field (drops duplicated planes)."""
    parts = [slabs[0]]
    for i in range(1, sg.num_shards):
        parts.append(slabs[i][1:])
    return jnp.concatenate(parts, axis=0)


def halo_sum_forces(f_local: jnp.ndarray) -> jnp.ndarray:
    """Accumulate boundary-plane force contributions between neighbors.

    After a local applyK, the first/last node planes hold partial sums
    (missing the neighbor slab's element contributions). One ppermute in
    each direction completes them — this is the only communication in
    the sharded stiffness apply.
    """
    idx = jax.lax.axis_index(AXIS)
    n = jax.lax.axis_size(AXIS)

    # send our last plane to the right neighbor; receive from the left
    last = f_local[-1]
    from_left = jax.lax.ppermute(
        last, AXIS, [(i, (i + 1) % n) for i in range(n)]
    )
    first = f_local[0]
    from_right = jax.lax.ppermute(
        first, AXIS, [(i, (i - 1) % n) for i in range(n)]
    )
    # interior shards add both; edge shards ignore the wrapped message
    add_first = jnp.where(idx > 0, from_left, jnp.zeros_like(from_left))
    add_last = jnp.where(idx < n - 1, from_right, jnp.zeros_like(from_right))
    f_local = f_local.at[0].add(add_first)
    f_local = f_local.at[-1].add(add_last)
    return f_local


def sync_halo_displacements(u_local: jnp.ndarray) -> jnp.ndarray:
    """Make the duplicated boundary node plane consistent (owner = left
    shard): copy each shard's first plane from its left neighbor's last
    plane. Used after local-only updates (e.g. smoothing variants)."""
    n = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    from_left = jax.lax.ppermute(
        u_local[-1], AXIS, [(i, (i + 1) % n) for i in range(n)]
    )
    first = jnp.where(idx > 0, from_left, u_local[0])
    return u_local.at[0].set(first)


def halo_overlap_apply(u_local, p_first, p_last, apply_full, apply_strip):
    """Stiffness apply with halo exchange OVERLAPPED with compute.

    :func:`halo_sum_forces` exchanges boundary *forces*, which depend on
    the whole local apply — the ppermute cannot start until the compute
    finishes, and the result waits on the wire. Here the exchange ships
    apply *inputs* instead (one u node plane + one operator element
    plane each way), which are ready at entry: XLA's latency-hiding
    scheduler can run the ICI transfer concurrently with the full local
    apply. Each shard then recomputes its two boundary element strips
    locally (one element plane each, ~2/L_x overhead) — the same
    contributions the neighbor would have shipped.

    ``p_first`` / ``p_last``: the operator's first/last element plane
    (young or cached Ke), shape ``(1, rest...)``. ``apply_strip(u2, p)``
    applies the operator on a 1-element-plane strip (u2: 2 node planes).
    Returns forces with both duplicated boundary planes complete, equal
    to ``halo_sum_forces(apply_full(u_local))``.
    """
    idx = jax.lax.axis_index(AXIS)
    n = jax.lax.axis_size(AXIS)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    # pre-exchange (ready at entry; overlaps with apply_full below)
    u_from_left = jax.lax.ppermute(u_local[-2], AXIS, fwd)
    p_from_left = jax.lax.ppermute(p_last, AXIS, fwd)
    u_from_right = jax.lax.ppermute(u_local[1], AXIS, bwd)
    p_from_right = jax.lax.ppermute(p_first, AXIS, bwd)

    f = apply_full(u_local)

    s0 = apply_strip(
        jnp.stack([u_from_left, u_local[0]], axis=0), p_from_left)
    s1 = apply_strip(
        jnp.stack([u_local[-1], u_from_right], axis=0), p_from_right)
    f = f.at[0].add(jnp.where(idx > 0, s0[1], jnp.zeros_like(s0[1])))
    f = f.at[-1].add(
        jnp.where(idx < n - 1, s1[0], jnp.zeros_like(s1[0])))
    return f


def make_sharded_apply_k(sg: ShardedGrid, K0: np.ndarray, overlap=True):
    """Per-shard stiffness apply: local matrix-free apply + halo
    completion (overlapped input pre-exchange by default)."""
    local_grid = sg.local_grid
    strip_grid = local_grid.with_dims((1,) + local_grid.dims[1:])

    def apply_k_shard(u_local, young_local):
        if not overlap:
            f = ops.apply_k(u_local, young_local, K0, local_grid)
            return halo_sum_forces(f)
        K0t = jnp.asarray(K0, u_local.dtype)
        return halo_overlap_apply(
            u_local, young_local[:1], young_local[-1:],
            lambda u: ops.apply_k(u, young_local, K0t, local_grid),
            lambda u2, p: ops.apply_k(u2, p, K0t, strip_grid),
        )

    return apply_k_shard


def psum_vdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Global dot product over slabs, not double-counting the duplicated
    boundary plane (owned by the left shard)."""
    idx = jax.lax.axis_index(AXIS)
    w = jnp.ones_like(a)
    w = w.at[0].set(jnp.where(idx > 0, 0.0, 1.0))
    return jax.lax.psum(jnp.vdot(a * w, b, precision=_HIGHEST), AXIS)


def make_sharded_cg(sg: ShardedGrid, prob: FEMProblem, tol: float,
                    max_iter: int):
    """Block-Jacobi-preconditioned CG over the sharded domain.

    All vectors live as slabs; communication = one ppermute pair per
    applyK + psum per dot product (all over ICI).
    """
    local_grid = sg.local_grid
    K0 = prob.K0
    apply_shard = make_sharded_apply_k(sg, K0)

    def solve(u0_l, young_l, b_l, dmask_l):
        def zero_d(v):
            return jnp.where(dmask_l, 0.0, v)

        def A(v):
            return zero_d(apply_shard(zero_d(v), young_l))

        # block-diagonal preconditioner with halo-summed diagonal blocks
        blocks = ops.node_diag_blocks(young_l, K0, local_grid)
        blocks = halo_sum_forces(blocks.reshape(blocks.shape[:-2] + (-1,))).reshape(
            blocks.shape
        )
        inv = ops.invert_blocks(blocks)

        def precond(r):
            return zero_d(jnp.einsum("...ij,...j->...i", inv, r,
                                     precision=_HIGHEST))

        b = zero_d(b_l)
        b_norm_sq = psum_vdot(b, b)
        x = zero_d(u0_l)
        r = b - A(x)

        def cond(state):
            x, r, d, rz, i = state
            return (i < max_iter) & (psum_vdot(r, r) > tol * tol * b_norm_sq)

        def body(state):
            x, r, d, rz_old, i = state
            z = precond(r)
            rz = psum_vdot(r, z)
            beta = jnp.where(i == 0, 0.0, rz / rz_old)
            d = z + beta * d
            ad = A(d)
            alpha = rz / psum_vdot(d, ad)
            return (x + alpha * d, r - alpha * ad, d, rz, i + 1)

        state = (x, r, jnp.zeros_like(b), jnp.asarray(1.0, b.dtype),
                 jnp.asarray(0, jnp.int32))
        x, r, _, _, iters = jax.lax.while_loop(cond, body, state)
        return x, iters

    return solve


def make_mesh(n_devices: int) -> Mesh:
    devs = np.array(jax.devices()[:n_devices])
    return Mesh(devs, (AXIS,))


# ---------------------------------------------------------------------------
# Sharded geometric multigrid (full MGPCG over the slab decomposition)
# ---------------------------------------------------------------------------
#
# Every multigrid ingredient maps onto the slab decomposition with only
# face-plane communication:
#   * Galerkin coarsening (deep-coarsened-K0 einsum over pooled Young
#     moduli, multigrid.py build_level_ke) is element-local -> no comms;
#   * prolongation is local given consistent (replicated) boundary node
#     planes, which it preserves;
#   * restriction is local except the shared coarse boundary plane: each
#     shard computes its own elements' contributions (the even-plane term
#     counted once, by the owning/left shard) and one halo ppermute pair
#     completes the plane;
#   * the Chebyshev smoother is a polynomial in (D^-1 K): the sharded K
#     apply + a halo-summed block diagonal make it SPMD for free (the
#     multicolor GS smoother is NOT shardable without plane-sequential
#     sweeps, so the sharded solver always smooths with Chebyshev — a
#     documented deviation, cf. multigrid.chebyshev_smooth);
#   * the coarsest level is all-gathered and solved densely (replicated
#     Cholesky) — the standard "agglomerate below a size threshold"
#     coarse-grid strategy.


def shard_elem_field(e: jnp.ndarray, sg: ShardedGrid) -> jnp.ndarray:
    """Split a global element field into per-shard slabs (no overlap):
    (num_shards, L, rest...)."""
    return e.reshape((sg.num_shards, sg.local_elems) + e.shape[1:])


def _local_slice_of_constant(arr: np.ndarray, planes_per_shard: int,
                             overlap: bool = True):
    """Inside shard_map: dynamic-slice this shard's slab out of a
    replicated host constant (used for static per-level Dirichlet masks).
    """
    a = jnp.asarray(arr)
    idx = jax.lax.axis_index(AXIS)
    start = idx * planes_per_shard
    size = planes_per_shard + (1 if overlap else 0)
    return jax.lax.dynamic_slice_in_dim(a, start, size, axis=0)


def restrict_sharded(r_local: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Sharded residual restriction: local [1/2,1,1/2]^N stencil with the
    shared fine plane's even-term counted only by its owner (the left
    shard), then a halo sum to complete the coarse boundary plane."""
    from ndr_tpu.fem import multigrid as mg

    idx = jax.lax.axis_index(AXIS)
    # drop the duplicated (non-owned) first plane's even contribution
    own_first = jnp.where(idx > 0, 0.0, 1.0).astype(r_local.dtype)
    r_local = r_local.at[0].multiply(own_first)
    out = r_local
    for axis in range(ndim):
        out = mg._restrict_axis(out, axis)
    return halo_sum_forces(out)


def prolong_sharded(u_coarse_local: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Sharded prolongation: purely local (boundary planes replicated and
    consistent on both sides stay consistent under interpolation)."""
    from ndr_tpu.fem import multigrid as mg

    return mg.prolongate(u_coarse_local, ndim)


def _sharded_lmax(apply_fn, dinv_fn, zero_fn, shape, dtype, iters: int = 8):
    """Power-iteration lambda_max(D^-1 K) with psum reductions (the
    sharded twin of multigrid._estimate_lmax)."""
    v = zero_fn(jax.random.normal(jax.random.PRNGKey(7), shape, dtype))
    v = sync_halo_displacements(v)

    def body(_, carry):
        v, lam = carry
        w = dinv_fn(zero_fn(apply_fn(v)))
        lam = jnp.sqrt(psum_vdot(w, w) / jnp.maximum(psum_vdot(v, v), 1e-30))
        return w / jnp.maximum(jnp.sqrt(psum_vdot(w, w)), 1e-30), lam

    _, lam = jax.lax.fori_loop(0, iters, body,
                               (v, jnp.asarray(1.0, dtype)))
    return 1.05 * lam


def make_sharded_mgpcg(sg: ShardedGrid, prob: FEMProblem, num_levels: int,
                       tol: float = 1e-4, max_iter: int = 100,
                       mg_smoothing_iterations: int = 2, cheb_degree: int = 2,
                       coarse_shift: float = 1e-5, lmax_power_iters: int = 8,
                       mixed_precision: bool = False,
                       use_pallas: bool = False,
                       max_refinements: int = 6):
    """Sharded MGPCG solve over the slab decomposition.

    Returns solve(u0_l, rho_l, b_l) for use inside shard_map over a
    1-D mesh on AXIS: u0_l/b_l are (L+1, rest_nodes..., N) node slabs,
    rho_l is the (L, rest_elems...) element slab. Dirichlet masks per
    level are baked in as replicated constants (static BCs).

    The per-shard local element count must be divisible by 2^num_levels.

    ``mixed_precision`` runs the same float64 iterative refinement as the
    single-chip solver (multigrid._mgpcg_solve_refined): true residual
    measured in f64 per shard (+ halo sum), fp32 MGPCG on the correction
    system, f64 accumulation — requires jax x64. ``use_pallas`` switches
    the per-shard fine apply to the fused Pallas kernel (and, with
    mixed_precision, the f64 residual to the two-float kernel) — TPU
    backends only.
    """
    from ndr_tpu.fem import multigrid as mg
    from ndr_tpu.fem import solvers

    grid0 = sg.global_grid
    ndim = grid0.ndim
    if sg.local_elems % (1 << num_levels):
        raise ValueError(
            f"local slab of {sg.local_elems} elements not divisible by "
            f"2^{num_levels}")

    # static per-level global grids + Dirichlet masks (host-side numpy)
    level_grids = [grid0]
    level_masks = [np.asarray(prob.dirichlet_mask)]
    for _ in range(num_levels):
        level_grids.append(level_grids[-1].coarsened())
        level_masks.append(mg.coarsen_dirichlet_mask(level_masks[-1]))
    local_grids = [
        g.with_dims((g.dims[0] // sg.num_shards,) + g.dims[1:])
        for g in level_grids
    ]
    # deep-coarsened K0 stacks (trace-time constants, grid-independent)
    K0 = np.asarray(prob.K0)
    c_stacks = {
        l: mg.deep_coarsened_k0s(K0, ndim, l) for l in range(1, num_levels + 1)
    }
    coarse_mask_flat = level_masks[-1].reshape(-1)
    # Guaranteed per-level lambda_max(D^-1 K) bounds: power iteration
    # converges from BELOW and sat ~10% under the true value at
    # multi-million-node grids, collapsing the (Chebyshev-only) sharded
    # smoother — the exact failure mode multigrid._pencil_lmax_bound was
    # introduced for. The bounds depend only on K0 / the deep-coarsened
    # component stacks (density- and shard-independent host constants),
    # so they mirror build_level_states exactly.
    lmax_bounds = {0: mg._pencil_lmax_bound(K0, ndim)}
    for l in range(1, num_levels + 1):
        lmax_bounds[l] = mg._pencil_lmax_bound(c_stacks[l], ndim)

    def build_levels(rho_l):
        """Per-shard level operators for one density slab."""
        young = ops.element_young_modulus(rho_l, prob.E0, prob.Emin, prob.gamma)
        levels = []
        for l in range(num_levels + 1):
            lg = local_grids[l]
            Lp = lg.dims[0]  # local element planes at this level
            mask_l = _local_slice_of_constant(level_masks[l], Lp)

            if l == 0:
                Ke = None
                blocks = ops.node_diag_blocks(young, K0, lg)
                sg0 = lg.with_dims((1,) + lg.dims[1:])

                if use_pallas:
                    def apply_l(u, young=young, lg=lg, sg0=sg0):
                        from ndr_tpu.fem import pallas_kernels as pk
                        return halo_overlap_apply(
                            u, young[:1], young[-1:],
                            lambda v: pk.apply_k_pallas_fine(v, young, K0, lg),
                            lambda u2, p: ops.apply_k(
                                u2, p, jnp.asarray(K0, u2.dtype), sg0),
                        )
                else:
                    def apply_l(u, young=young, lg=lg, sg0=sg0):
                        K0t = jnp.asarray(K0, u.dtype)
                        return halo_overlap_apply(
                            u, young[:1], young[-1:],
                            lambda v: ops.apply_k(v, young, K0t, lg),
                            lambda u2, p: ops.apply_k(u2, p, K0t, sg0),
                        )
            else:
                C = jnp.asarray(c_stacks[l], young.dtype)
                pooled = mg.pooled_young(young, l)
                Ke = jnp.einsum("...r,rde->...de", pooled, C,
                                precision=_HIGHEST,
                                preferred_element_type=young.dtype)
                blocks = ops.node_diag_blocks_cached(Ke, lg)

                def apply_l(u, Ke=Ke, lg=lg):
                    sgl = lg.with_dims((1,) + lg.dims[1:])
                    return halo_overlap_apply(
                        u, Ke[:1], Ke[-1:],
                        lambda v: ops.apply_k_cached(v, Ke, lg),
                        lambda u2, p: ops.apply_k_cached(u2, p, sgl),
                    )

            blocks = halo_sum_forces(blocks)
            Dinv = ops.invert_blocks(blocks)

            def zero_l(u, mask_l=mask_l):
                return jnp.where(mask_l, 0.0, u)

            def dinv_l(r, Dinv=Dinv, mask_l=mask_l):
                z = jnp.einsum("...ij,...j->...i", Dinv, r,
                               precision=_HIGHEST)
                return jnp.where(mask_l, 0.0, z)

            shape = lg.nodes_per_dim + (ndim,)
            bound = jnp.asarray(lmax_bounds[l], young.dtype)
            if lmax_power_iters > 0:
                # inflated power estimate, min'ed with the guaranteed
                # bound (the estimate tightens deep Galerkin levels where
                # the bound is loose; the bound caps under-estimation)
                est = (1.2 / 1.05) * _sharded_lmax(
                    apply_l, dinv_l, zero_l, shape, young.dtype,
                    iters=lmax_power_iters)
                lmax = jnp.minimum(bound, est)
            else:
                lmax = bound
            levels.append(dict(apply=apply_l, dinv=dinv_l, zero=zero_l,
                               lmax=lmax, Ke=Ke, grid=lg))
        return levels

    def factor_coarse(levels):
        """All-gather the coarsest Ke and prepare the dense global coarse
        solve (replicated — identical on every shard). fp32 hierarchies
        use the matmul-only Newton-Schulz inverse (multigrid.ns_inverse:
        MXU-bound, unlike the serial-structure-bound cho_factor that
        costs tens of ms per rebuild on TPU); float64 keeps Cholesky."""
        Ke_l = levels[-1]["Ke"]
        Ke_g = jax.lax.all_gather(Ke_l, AXIS)      # (n, L_c, rest..., d, d)
        Ke_g = Ke_g.reshape((-1,) + Ke_g.shape[2:])
        Kd = solvers.assemble_dense_k_traced(Ke_g, level_grids[-1])
        m = jnp.asarray(coarse_mask_flat)
        Kd = jnp.where(m[:, None] | m[None, :], 0.0, Kd)
        Kd = Kd + jnp.diag(m.astype(Kd.dtype))
        eps = coarse_shift if Kd.dtype == jnp.float32 else 1e-12
        Kd = Kd + jnp.diag(eps * jnp.diagonal(Kd))
        if Kd.dtype == jnp.float32:
            return ("ns", mg.ns_inverse(Kd))
        return ("chol", jax.scipy.linalg.cho_factor(Kd, lower=True))

    def coarse_solve(coarse, b_l):
        """Gather the coarse rhs, replicated dense solve, return the
        local slab (with its shared boundary planes)."""
        kind, data = coarse
        lgc = local_grids[-1]
        Lc = lgc.dims[0]
        b_g = jax.lax.all_gather(b_l, AXIS)        # (n, Lc+1, rest..., N)
        parts = [b_g[0]] + [b_g[i][1:] for i in range(1, sg.num_shards)]
        b_full = jnp.concatenate(parts, axis=0)
        m = jnp.asarray(coarse_mask_flat)
        rhs = jnp.where(m, 0.0, b_full.reshape(-1))
        if kind == "ns":
            x = jnp.matmul(data, rhs,
                           precision=jax.lax.Precision.HIGHEST)
        else:
            x = jax.scipy.linalg.cho_solve(data, rhs)
        x = x.reshape(b_full.shape)
        idx = jax.lax.axis_index(AXIS)
        return jax.lax.dynamic_slice_in_dim(x, idx * Lc, Lc + 1, axis=0)

    def smooth(lv, x, b, x_is_zero=False, need_r=False):
        # chain the smoother's incrementally-maintained residual between
        # sweeps (r0) and into the V-cycle's restriction (need_r): one
        # halo'd stiffness apply saved per hand-off
        # (see multigrid.chebyshev_core)
        r = None
        for k in range(mg_smoothing_iterations):
            last = k == mg_smoothing_iterations - 1
            x, r = mg.chebyshev_core(lv["apply"], lv["dinv"], lv["zero"],
                                     lv["lmax"], x, b, cheb_degree,
                                     x_is_zero=x_is_zero and k == 0,
                                     need_r=need_r or not last, r0=r)
        return x, r

    def vcycle(levels, chol, l, x, b, x_is_zero=False):
        if l == num_levels:
            return coarse_solve(chol, b)
        x, r = smooth(levels[l], x, b, x_is_zero=x_is_zero, need_r=True)
        r_c = levels[l + 1]["zero"](restrict_sharded(r, ndim))
        e_c = vcycle(levels, chol, l + 1, 0.0 * r_c,
                     r_c, x_is_zero=True)
        x = x + levels[l]["zero"](prolong_sharded(e_c, ndim))
        x, _ = smooth(levels[l], x, b)
        return x

    def _cg(levels, chol, u0, b, tol_, tol_is_abs=False):
        """fp32 MGPCG given built levels; tol_ is relative to ||b||
        unless tol_is_abs."""
        lv0 = levels[0]

        def A(v):
            return lv0["zero"](lv0["apply"](lv0["zero"](v)))

        def precond(r):
            return lv0["zero"](
                vcycle(levels, chol, 0, 0.0 * r, r, x_is_zero=True))

        b = lv0["zero"](b)
        b_norm_sq = psum_vdot(b, b)
        thresh_sq = (tol_ * tol_) if tol_is_abs else (
            tol_ * tol_ * b_norm_sq)
        x = lv0["zero"](u0)
        r = b - A(x)

        def cond(state):
            x, r, d, rz, i = state
            return (i < max_iter) & (psum_vdot(r, r) > thresh_sq)

        def body(state):
            x, r, d, rz_old, i = state
            z = precond(r)
            rz = psum_vdot(r, z)
            beta = jnp.where(i == 0, 0.0, rz / rz_old)
            d = z + beta * d
            ad = A(d)
            alpha = rz / psum_vdot(d, ad)
            return (x + alpha * d, r - alpha * ad, d, rz, i + 1)

        state = (x, r, jnp.zeros_like(b), jnp.asarray(1.0, b.dtype),
                 jnp.asarray(0, jnp.int32))
        x, r, _, _, iters = jax.lax.while_loop(cond, body, state)
        return x, iters

    def solve(u0_l, rho_l, b_l):
        levels = build_levels(rho_l)
        chol = factor_coarse(levels)
        return _cg(levels, chol, u0_l, b_l, tol)

    if not mixed_precision:
        return solve

    # ---- float64 iterative refinement around the fp32 sharded MGPCG ----
    # (sharded twin of multigrid._mgpcg_solve_refined: per-shard f64
    #  residual + halo sum; fp32 correction solves; f64 accumulation)
    f32, f64 = jnp.float32, jnp.float64
    lg0 = local_grids[0]
    mask0_np = level_masks[0]
    fp32_floor = 5e-4

    def solve_refined(u0_l, rho_l, b_l):
        rho32 = rho_l.astype(f32)
        levels = build_levels(rho32)
        chol = factor_coarse(levels)
        lv0 = levels[0]

        Lp = lg0.dims[0]
        mask_l = _local_slice_of_constant(mask0_np, Lp)

        def zero_d64(v):
            return jnp.where(mask_l, 0.0, v)

        young64 = ops.element_young_modulus(
            rho_l.astype(f64), prob.E0, prob.Emin, prob.gamma)
        b64 = zero_d64(b_l.astype(f64))

        K0_64 = jnp.asarray(K0, f64)
        sg0 = lg0.with_dims((1,) + lg0.dims[1:])
        if use_pallas:
            from ndr_tpu.fem import pallas_kernels as pk
            y_hi = young64.astype(f32)
            y_lo = (young64 - y_hi.astype(f64)).astype(f32)

            def residual64(u):
                ku = halo_overlap_apply(
                    u, young64[:1], young64[-1:],
                    lambda v: pk.apply_k_pallas_df_fine(
                        v.astype(f32),
                        (v - v.astype(f32).astype(f64)).astype(f32),
                        y_hi, y_lo, K0, lg0),
                    lambda u2, p: ops.apply_k(u2, p, K0_64, sg0),
                )
                return zero_d64(b64 - ku)
        else:
            def residual64(u):
                ku = halo_overlap_apply(
                    u, young64[:1], young64[-1:],
                    lambda v: ops.apply_k(v, young64, K0_64, lg0),
                    lambda u2, p: ops.apply_k(u2, p, K0_64, sg0),
                )
                return zero_d64(b64 - ku)

        b_norm = jnp.sqrt(psum_vdot(b64, b64))
        u = zero_d64(u0_l.astype(f64))

        tiny = jnp.asarray(1e-300, f64)

        def needed_reduction(r):
            rn = jnp.maximum(jnp.sqrt(psum_vdot(r, r)), tiny)
            return tol * b_norm / rn

        def body(state):
            u, r, done, it_tot, k = state
            needed = needed_reduction(r)
            inner_tol = jnp.clip(0.5 * needed, fp32_floor, 0.9).astype(f32)
            e32, iters = _cg(levels, chol, jnp.zeros(r.shape, f32),
                             r.astype(f32), inner_tol)
            u = u + e32.astype(f64)
            done = 0.5 * needed >= fp32_floor
            r = jax.lax.cond(done, lambda v: r, residual64, u)
            return u, r, done, it_tot + iters, k + 1

        def cond(state):
            u, r, done, it_tot, k = state
            return (~done) & (k < max_refinements)

        r0 = residual64(u)
        u, r, done, total_iters, k = jax.lax.while_loop(
            cond, body,
            (u, r0, jnp.asarray(False), jnp.asarray(0, jnp.int32),
             jnp.asarray(0, jnp.int32)),
        )
        return u, total_iters

    return solve_refined


# ---------------------------------------------------------------------------
# 2-D domain decomposition: pencils over a 2-D ICI mesh
# ---------------------------------------------------------------------------
#
# The 1-D slab decomposition above matches small device counts; past
# ~16-32 chips the slabs get too thin to coarsen (local_elems must divide
# 2^mgl) and a single mesh axis uses only one ICI dimension of the
# physical 2-D/3-D torus. The 2-D decomposition splits the two leading
# element dimensions over a Mesh((nx, ny), ("x", "y")) so collectives
# ride both ICI rings.
#
# Correctness of composed face exchanges: a corner node's missing
# contributions from the DIAGONAL neighbor arrive transitively — the
# x-direction force sum completes each shard's x-boundary planes
# (including their y-boundary lines with the x-neighbor's share), and the
# subsequent y-direction sum ships those completed lines across y. The
# same transitivity argument makes owner-consistent sync and the
# duplicated-plane dot-product weights compose per axis. (SPMD program
# order guarantees every shard finishes the x exchange before the y
# exchange starts.)

AXIS_Y = "y"  # second mesh axis for the 2-D decomposition


def _plane_index(ax: int, i) -> tuple:
    return (slice(None),) * ax + (i,)


def _halo_sum_axis(f: jnp.ndarray, ax: int, axis_name: str) -> jnp.ndarray:
    """Axis-generic :func:`halo_sum_forces`: complete the duplicated
    first/last planes of `f` along array axis `ax` over mesh axis
    `axis_name`."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    last = f[_plane_index(ax, f.shape[ax] - 1)]
    first = f[_plane_index(ax, 0)]
    from_left = jax.lax.ppermute(last, axis_name, fwd)
    from_right = jax.lax.ppermute(first, axis_name, bwd)
    add_first = jnp.where(idx > 0, from_left, jnp.zeros_like(from_left))
    add_last = jnp.where(idx < n - 1, from_right,
                         jnp.zeros_like(from_right))
    f = f.at[_plane_index(ax, 0)].add(add_first)
    f = f.at[_plane_index(ax, f.shape[ax] - 1)].add(add_last)
    return f


def _sync_halo_axis(u: jnp.ndarray, ax: int, axis_name: str) -> jnp.ndarray:
    """Axis-generic :func:`sync_halo_displacements` (owner = lower-index
    shard along `axis_name`)."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(
        u[_plane_index(ax, u.shape[ax] - 1)], axis_name, fwd)
    first = jnp.where(idx > 0, from_left, u[_plane_index(ax, 0)])
    return u.at[_plane_index(ax, 0)].set(first)


def halo_sum_forces_2d(f: jnp.ndarray) -> jnp.ndarray:
    """Complete duplicated boundary planes over both mesh axes (x first,
    then y; corners arrive transitively — see the section comment)."""
    return _halo_sum_axis(_halo_sum_axis(f, 0, AXIS), 1, AXIS_Y)


def sync_halo_2d(u: jnp.ndarray) -> jnp.ndarray:
    return _sync_halo_axis(_sync_halo_axis(u, 0, AXIS), 1, AXIS_Y)


def psum_vdot_2d(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Global dot product over the 2-D decomposition: duplicated planes
    (owned by the lower-index neighbor along each axis) weighted out,
    psum over both mesh axes."""
    ix = jax.lax.axis_index(AXIS)
    iy = jax.lax.axis_index(AXIS_Y)
    w = jnp.ones_like(a)
    w = w.at[0].set(jnp.where(ix > 0, jnp.zeros_like(w[0]), w[0]))
    w = w.at[:, 0].set(jnp.where(iy > 0, jnp.zeros_like(w[:, 0]), w[:, 0]))
    return jax.lax.psum(
        jnp.vdot(a * w, b, precision=_HIGHEST), (AXIS, AXIS_Y))


@dataclasses.dataclass(frozen=True)
class ShardedGrid2D:
    """Static description of the 2-D pencil decomposition: the two
    leading element dims split into (shards_x, shards_y) equal pencils;
    each shard stores its element pencil plus the duplicated boundary
    node planes along both sharded axes."""

    global_grid: Grid
    shards_x: int
    shards_y: int

    def __post_init__(self):
        gd = self.global_grid.dims
        if gd[0] % self.shards_x or gd[1] % self.shards_y:
            raise ValueError(
                f"dims {gd[:2]} not divisible by ({self.shards_x}, "
                f"{self.shards_y}) shards")

    @property
    def local_dims(self) -> Tuple[int, ...]:
        gd = self.global_grid.dims
        return ((gd[0] // self.shards_x, gd[1] // self.shards_y)
                + gd[2:])

    @property
    def local_grid(self) -> Grid:
        return self.global_grid.with_dims(self.local_dims)


def make_mesh_2d(shards_x: int, shards_y: int) -> Mesh:
    devs = np.array(jax.devices()[: shards_x * shards_y])
    return Mesh(devs.reshape(shards_x, shards_y), (AXIS, AXIS_Y))


def shard_node_field_2d(u: jnp.ndarray, sg: ShardedGrid2D) -> jnp.ndarray:
    """(nx, ny, Lx*d+1, Ly*d+1, rest..., N) stack with the shared
    boundary planes replicated along both sharded axes."""
    d = sg.global_grid.degree
    Lx, Ly = sg.local_dims[:2]
    rows = []
    for i in range(sg.shards_x):
        cols = []
        for j in range(sg.shards_y):
            cols.append(u[i * Lx * d:(i + 1) * Lx * d + 1,
                          j * Ly * d:(j + 1) * Ly * d + 1])
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def unshard_node_field_2d(slabs: jnp.ndarray,
                          sg: ShardedGrid2D) -> jnp.ndarray:
    """Inverse of :func:`shard_node_field_2d` (drops duplicated planes)."""
    rows = []
    for i in range(sg.shards_x):
        cols = []
        for j in range(sg.shards_y):
            blk = slabs[i, j]
            if i > 0:
                blk = blk[1:]
            if j > 0:
                blk = blk[:, 1:]
            cols.append(blk)
        rows.append(jnp.concatenate(cols, axis=1))
    return jnp.concatenate(rows, axis=0)


def shard_elem_field_2d(e: jnp.ndarray, sg: ShardedGrid2D) -> jnp.ndarray:
    """(nx, ny, Lx, Ly, rest...) element pencils (no overlap)."""
    Lx, Ly = sg.local_dims[:2]
    rows = []
    for i in range(sg.shards_x):
        cols = [e[i * Lx:(i + 1) * Lx, j * Ly:(j + 1) * Ly]
                for j in range(sg.shards_y)]
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _local_slice_2d(arr: np.ndarray, planes_x: int, planes_y: int,
                    overlap: bool = True):
    """Inside shard_map: this shard's pencil of a replicated host
    constant (per-level Dirichlet masks)."""
    a = jnp.asarray(arr)
    ix = jax.lax.axis_index(AXIS)
    iy = jax.lax.axis_index(AXIS_Y)
    ov = 1 if overlap else 0
    a = jax.lax.dynamic_slice_in_dim(a, ix * planes_x, planes_x + ov,
                                     axis=0)
    return jax.lax.dynamic_slice_in_dim(a, iy * planes_y, planes_y + ov,
                                        axis=1)


def restrict_sharded_2d(r_local: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """2-D-sharded residual restriction: the duplicated first plane's
    even-term is counted only by its owner along EACH sharded axis, the
    [1/2,1,1/2]^N stencil is local, and composed face sums complete the
    coarse boundary planes (corners transitively)."""
    from ndr_tpu.fem import multigrid as mg

    ix = jax.lax.axis_index(AXIS)
    iy = jax.lax.axis_index(AXIS_Y)
    own_x = jnp.where(ix > 0, 0.0, 1.0).astype(r_local.dtype)
    own_y = jnp.where(iy > 0, 0.0, 1.0).astype(r_local.dtype)
    r_local = r_local.at[0].multiply(own_x)
    r_local = r_local.at[:, 0].multiply(own_y)
    out = r_local
    for axis in range(ndim):
        out = mg._restrict_axis(out, axis)
    return halo_sum_forces_2d(out)


def make_sharded_mgpcg_2d(sg: ShardedGrid2D, prob: FEMProblem,
                          num_levels: int, tol: float = 1e-4,
                          max_iter: int = 100,
                          mg_smoothing_iterations: int = 2,
                          cheb_degree: int = 2,
                          coarse_shift: float = 1e-5,
                          mixed_precision: bool = False,
                          use_pallas: bool = False,
                          max_refinements: int = 6):
    """Sharded MGPCG over the 2-D pencil decomposition.

    The same solver as :func:`make_sharded_mgpcg` with every face
    exchange composed over both mesh axes (force-sum halos; the 1-D
    path's input-pre-exchange overlap stays x-only by design — the
    y-direction force sum completes x-strip corner contributions
    transitively, see the section comment). Per-shard local element
    counts along BOTH sharded dims must divide 2^num_levels.

    (reference scaling analogue: SURVEY.md §2.3/§5.8 — the reference is
    single-node TBB; this is the multi-chip extension's scale-out form.)
    """
    from ndr_tpu.fem import multigrid as mg
    from ndr_tpu.fem import solvers

    grid0 = sg.global_grid
    ndim = grid0.ndim
    Lx, Ly = sg.local_dims[:2]
    if Lx % (1 << num_levels) or Ly % (1 << num_levels):
        raise ValueError(
            f"local pencil {(Lx, Ly)} not divisible by 2^{num_levels}")

    level_grids = [grid0]
    level_masks = [np.asarray(prob.dirichlet_mask)]
    for _ in range(num_levels):
        level_grids.append(level_grids[-1].coarsened())
        level_masks.append(mg.coarsen_dirichlet_mask(level_masks[-1]))
    local_grids = [
        g.with_dims((g.dims[0] // sg.shards_x, g.dims[1] // sg.shards_y)
                    + g.dims[2:])
        for g in level_grids
    ]
    K0 = np.asarray(prob.K0)
    c_stacks = {
        l: mg.deep_coarsened_k0s(K0, ndim, l)
        for l in range(1, num_levels + 1)
    }
    coarse_mask_flat = level_masks[-1].reshape(-1)
    lmax_bounds = {0: mg._pencil_lmax_bound(K0, ndim)}
    for l in range(1, num_levels + 1):
        lmax_bounds[l] = mg._pencil_lmax_bound(c_stacks[l], ndim)

    def build_levels(rho_l):
        young = ops.element_young_modulus(
            rho_l, prob.E0, prob.Emin, prob.gamma)
        levels = []
        for l in range(num_levels + 1):
            lg = local_grids[l]
            mask_l = _local_slice_2d(level_masks[l], lg.dims[0], lg.dims[1])
            # x-direction: input-pre-exchange overlap (halo_overlap_apply
            # == the x force sum, equivalence-tested on the 1-D path), so
            # the ICI transfer hides under the local apply; y-direction:
            # force sum, which also completes x-strip corner terms
            # transitively (see the section comment)
            if l == 0:
                Ke = None
                blocks = ops.node_diag_blocks(young, K0, lg)
                sg0 = lg.with_dims((1,) + lg.dims[1:])
                if use_pallas:
                    def apply_l(u, young=young, lg=lg, sg0=sg0):
                        from ndr_tpu.fem import pallas_kernels as pk
                        f = halo_overlap_apply(
                            u, young[:1], young[-1:],
                            lambda v: pk.apply_k_pallas_fine(v, young, K0, lg),
                            lambda u2, p: ops.apply_k(
                                u2, p, jnp.asarray(K0, u2.dtype), sg0),
                        )
                        return _halo_sum_axis(f, 1, AXIS_Y)
                else:
                    def apply_l(u, young=young, lg=lg, sg0=sg0):
                        K0t = jnp.asarray(K0, u.dtype)
                        f = halo_overlap_apply(
                            u, young[:1], young[-1:],
                            lambda v: ops.apply_k(v, young, K0t, lg),
                            lambda u2, p: ops.apply_k(u2, p, K0t, sg0),
                        )
                        return _halo_sum_axis(f, 1, AXIS_Y)
            else:
                C = jnp.asarray(c_stacks[l], young.dtype)
                pooled = mg.pooled_young(young, l)
                Ke = jnp.einsum("...r,rde->...de", pooled, C,
                                precision=_HIGHEST,
                                preferred_element_type=young.dtype)
                blocks = ops.node_diag_blocks_cached(Ke, lg)

                def apply_l(u, Ke=Ke, lg=lg):
                    sgl = lg.with_dims((1,) + lg.dims[1:])
                    f = halo_overlap_apply(
                        u, Ke[:1], Ke[-1:],
                        lambda v: ops.apply_k_cached(v, Ke, lg),
                        lambda u2, p: ops.apply_k_cached(u2, p, sgl),
                    )
                    return _halo_sum_axis(f, 1, AXIS_Y)

            blocks = halo_sum_forces_2d(blocks)
            Dinv = ops.invert_blocks(blocks)

            def zero_l(u, mask_l=mask_l):
                return jnp.where(mask_l, 0.0, u)

            def dinv_l(r, Dinv=Dinv, mask_l=mask_l):
                z = jnp.einsum("...ij,...j->...i", Dinv, r,
                               precision=_HIGHEST)
                return jnp.where(mask_l, 0.0, z)

            # the guaranteed pencil bound alone (density-independent host
            # constant; the sharded power estimate exists on the 1-D path
            # — at 2-D scale the bound's trace-time constancy wins)
            lmax = jnp.asarray(lmax_bounds[l], young.dtype)
            levels.append(dict(apply=apply_l, dinv=dinv_l, zero=zero_l,
                               lmax=lmax, Ke=Ke, grid=lg))
        return levels

    def _gather_elem_full(x_l):
        """All-gather an element pencil into the global element field."""
        gx = jax.lax.all_gather(x_l, AXIS)         # (nx, Lx, Ly, ...)
        g = jax.lax.all_gather(gx, AXIS_Y)         # (ny, nx, Lx, Ly, ...)
        rows = [
            jnp.concatenate([g[j, i] for j in range(sg.shards_y)], axis=1)
            for i in range(sg.shards_x)
        ]
        return jnp.concatenate(rows, axis=0)

    def _gather_node_full(b_l):
        """All-gather a node pencil (duplicated planes dropped)."""
        gx = jax.lax.all_gather(b_l, AXIS)
        g = jax.lax.all_gather(gx, AXIS_Y)         # (ny, nx, Lx+1, Ly+1, ..)
        rows = []
        for i in range(sg.shards_x):
            cols = []
            for j in range(sg.shards_y):
                blk = g[j, i]
                if i > 0:
                    blk = blk[1:]
                if j > 0:
                    blk = blk[:, 1:]
                cols.append(blk)
            rows.append(jnp.concatenate(cols, axis=1))
        return jnp.concatenate(rows, axis=0)

    def factor_coarse(levels):
        Ke_full = _gather_elem_full(levels[-1]["Ke"])
        Kd = solvers.assemble_dense_k_traced(Ke_full, level_grids[-1])
        m = jnp.asarray(coarse_mask_flat)
        Kd = jnp.where(m[:, None] | m[None, :], 0.0, Kd)
        Kd = Kd + jnp.diag(m.astype(Kd.dtype))
        eps = coarse_shift if Kd.dtype == jnp.float32 else 1e-12
        Kd = Kd + jnp.diag(eps * jnp.diagonal(Kd))
        if Kd.dtype == jnp.float32:
            return ("ns", mg.ns_inverse(Kd))
        return ("chol", jax.scipy.linalg.cho_factor(Kd, lower=True))

    def coarse_solve(coarse, b_l):
        kind, data = coarse
        lgc = local_grids[-1]
        b_full = _gather_node_full(b_l)
        m = jnp.asarray(coarse_mask_flat)
        rhs = jnp.where(m, 0.0, b_full.reshape(-1))
        if kind == "ns":
            x = jnp.matmul(data, rhs, precision=jax.lax.Precision.HIGHEST)
        else:
            x = jax.scipy.linalg.cho_solve(data, rhs)
        x = x.reshape(b_full.shape)
        ix = jax.lax.axis_index(AXIS)
        iy = jax.lax.axis_index(AXIS_Y)
        x = jax.lax.dynamic_slice_in_dim(
            x, ix * lgc.dims[0], lgc.dims[0] + 1, axis=0)
        return jax.lax.dynamic_slice_in_dim(
            x, iy * lgc.dims[1], lgc.dims[1] + 1, axis=1)

    def smooth(lv, x, b, x_is_zero=False, need_r=False):
        r = None
        for k in range(mg_smoothing_iterations):
            last = k == mg_smoothing_iterations - 1
            x, r = mg.chebyshev_core(lv["apply"], lv["dinv"], lv["zero"],
                                     lv["lmax"], x, b, cheb_degree,
                                     x_is_zero=x_is_zero and k == 0,
                                     need_r=need_r or not last, r0=r)
        return x, r

    def vcycle(levels, chol, l, x, b, x_is_zero=False):
        if l == num_levels:
            return coarse_solve(chol, b)
        x, r = smooth(levels[l], x, b, x_is_zero=x_is_zero, need_r=True)
        r_c = levels[l + 1]["zero"](restrict_sharded_2d(r, ndim))
        e_c = vcycle(levels, chol, l + 1, 0.0 * r_c, r_c, x_is_zero=True)
        x = x + levels[l]["zero"](mg.prolongate(e_c, ndim))
        x, _ = smooth(levels[l], x, b)
        return x

    def _cg(levels, chol, u0, b, tol_, tol_is_abs=False):
        lv0 = levels[0]

        def A(v):
            return lv0["zero"](lv0["apply"](lv0["zero"](v)))

        def precond(r):
            return lv0["zero"](
                vcycle(levels, chol, 0, 0.0 * r, r, x_is_zero=True))

        b = lv0["zero"](b)
        b_norm_sq = psum_vdot_2d(b, b)
        thresh_sq = (tol_ * tol_) if tol_is_abs else (
            tol_ * tol_ * b_norm_sq)
        x = lv0["zero"](u0)
        r = b - A(x)

        def cond(state):
            x, r, d, rz, i = state
            return (i < max_iter) & (psum_vdot_2d(r, r) > thresh_sq)

        def body(state):
            x, r, d, rz_old, i = state
            z = precond(r)
            rz = psum_vdot_2d(r, z)
            beta = jnp.where(i == 0, 0.0, rz / rz_old)
            d = z + beta * d
            ad = A(d)
            alpha = rz / psum_vdot_2d(d, ad)
            return (x + alpha * d, r - alpha * ad, d, rz, i + 1)

        state = (x, r, jnp.zeros_like(b), jnp.asarray(1.0, b.dtype),
                 jnp.asarray(0, jnp.int32))
        x, r, _, _, iters = jax.lax.while_loop(cond, body, state)
        return x, iters

    def solve(u0_l, rho_l, b_l):
        levels = build_levels(rho_l)
        chol = factor_coarse(levels)
        return _cg(levels, chol, u0_l, b_l, tol)

    if not mixed_precision:
        return solve

    f32, f64 = jnp.float32, jnp.float64
    lg0 = local_grids[0]
    mask0_np = level_masks[0]
    fp32_floor = 5e-4

    def solve_refined(u0_l, rho_l, b_l):
        rho32 = rho_l.astype(f32)
        levels = build_levels(rho32)
        chol = factor_coarse(levels)

        mask_l = _local_slice_2d(mask0_np, lg0.dims[0], lg0.dims[1])

        def zero_d64(v):
            return jnp.where(mask_l, 0.0, v)

        young64 = ops.element_young_modulus(
            rho_l.astype(f64), prob.E0, prob.Emin, prob.gamma)
        b64 = zero_d64(b_l.astype(f64))
        K0_64 = jnp.asarray(K0, f64)

        sg0 = lg0.with_dims((1,) + lg0.dims[1:])

        def residual64(u):
            ku = halo_overlap_apply(
                u, young64[:1], young64[-1:],
                lambda v: ops.apply_k(v, young64, K0_64, lg0),
                lambda u2, p: ops.apply_k(u2, p, K0_64, sg0),
            )
            return zero_d64(b64 - _halo_sum_axis(ku, 1, AXIS_Y))

        b_norm = jnp.sqrt(psum_vdot_2d(b64, b64))
        u = zero_d64(u0_l.astype(f64))
        tiny = jnp.asarray(1e-300, f64)

        def needed_reduction(r):
            rn = jnp.maximum(jnp.sqrt(psum_vdot_2d(r, r)), tiny)
            return tol * b_norm / rn

        def body(state):
            u, r, done, it_tot, k = state
            needed = needed_reduction(r)
            inner_tol = jnp.clip(0.5 * needed, fp32_floor, 0.9).astype(f32)
            e32, iters = _cg(levels, chol, jnp.zeros(r.shape, f32),
                             r.astype(f32), inner_tol)
            u = u + e32.astype(f64)
            done = 0.5 * needed >= fp32_floor
            r = jax.lax.cond(done, lambda v: r, residual64, u)
            return u, r, done, it_tot + iters, k + 1

        def cond(state):
            u, r, done, it_tot, k = state
            return (~done) & (k < max_refinements)

        r0 = residual64(u)
        u, r, done, total_iters, k = jax.lax.while_loop(
            cond, body,
            (u, r0, jnp.asarray(False), jnp.asarray(0, jnp.int32),
             jnp.asarray(0, jnp.int32)),
        )
        return u, total_iters

    return solve_refined


def make_sharded_solver_2d(prob: FEMProblem, shards_x: int, shards_y: int,
                           num_levels: int, tol: float = 1e-4,
                           max_iter: int = 100,
                           mg_smoothing_iterations: int = 2,
                           cheb_degree: int = 2,
                           mixed_precision: bool = True,
                           use_pallas: bool = False,
                           mesh: Optional[Mesh] = None):
    """(rho, u0) -> (u, iters) SolveFn over a 2-D (shards_x, shards_y)
    device mesh — the 2-D twin of :func:`make_sharded_solver`
    (`train_voxelfem --shards NX,NY`)."""
    from jax.experimental.shard_map import shard_map

    sg = ShardedGrid2D(global_grid=prob.grid, shards_x=shards_x,
                       shards_y=shards_y)
    mesh = mesh or make_mesh_2d(shards_x, shards_y)
    solve_shard = make_sharded_mgpcg_2d(
        sg, prob, num_levels=num_levels, tol=tol, max_iter=max_iter,
        mg_smoothing_iterations=mg_smoothing_iterations,
        cheb_degree=cheb_degree, mixed_precision=mixed_precision,
        use_pallas=use_pallas)

    def solve_one(u0_l, rho_l, b_l):
        x, iters = solve_shard(u0_l[0, 0], rho_l[0, 0], b_l[0, 0])
        return x[None, None], iters

    shmap_solve = shard_map(
        solve_one, mesh=mesh,
        in_specs=(P(AXIS, AXIS_Y), P(AXIS, AXIS_Y), P(AXIS, AXIS_Y)),
        out_specs=(P(AXIS, AXIS_Y), P()),
    )

    def solve(rho, u0=None):
        b = jnp.where(prob.dirichlet_mask, 0.0, prob.force)
        if mixed_precision:
            b = b.astype(jnp.float64)
        if u0 is None:
            u0 = jnp.zeros_like(b)
        u0 = u0.astype(b.dtype)
        with mesh:
            u_slabs, iters = shmap_solve(
                shard_node_field_2d(u0, sg),
                shard_elem_field_2d(rho.astype(prob.force.dtype), sg),
                shard_node_field_2d(b, sg),
            )
        return unshard_node_field_2d(u_slabs, sg), iters

    return solve


# ---------------------------------------------------------------------------
# Driver integration: a global-array SolveFn over the slab decomposition
# ---------------------------------------------------------------------------

def make_sharded_solver(prob: FEMProblem, num_shards: int,
                        num_levels: int, tol: float = 1e-4,
                        max_iter: int = 100,
                        mg_smoothing_iterations: int = 2,
                        cheb_degree: int = 2,
                        mixed_precision: bool = True,
                        use_pallas: bool = False,
                        mesh: Optional[Mesh] = None):
    """A (rho, u0) -> (u, iters) SolveFn running the sharded MGPCG over a
    `num_shards`-device mesh — drop-in for topopt/classic drivers
    (`train_voxelfem --shards N`). Global fields are slab-stacked on the
    host side of shard_map; all solver communication is ppermute halos +
    psum reductions over the mesh axis.
    """
    from jax.experimental.shard_map import shard_map

    sg = ShardedGrid(global_grid=prob.grid, num_shards=num_shards)
    mesh = mesh or make_mesh(num_shards)
    solve_shard = make_sharded_mgpcg(
        sg, prob, num_levels=num_levels, tol=tol, max_iter=max_iter,
        mg_smoothing_iterations=mg_smoothing_iterations,
        cheb_degree=cheb_degree, mixed_precision=mixed_precision,
        use_pallas=use_pallas)

    def solve_one(u0_l, rho_l, b_l):
        x, iters = solve_shard(u0_l[0], rho_l[0], b_l[0])
        return x[None], iters

    shmap_solve = shard_map(
        solve_one, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P()),
    )

    def solve(rho, u0=None):
        b = jnp.where(prob.dirichlet_mask, 0.0, prob.force)
        if mixed_precision:
            b = b.astype(jnp.float64)
        if u0 is None:
            u0 = jnp.zeros_like(b)
        u0 = u0.astype(b.dtype)
        with mesh:
            u_slabs, iters = shmap_solve(
                shard_node_field(u0, sg),
                shard_elem_field(rho.astype(prob.force.dtype), sg),
                shard_node_field(b, sg),
            )
        return unshard_node_field(u_slabs, sg), iters

    return solve
