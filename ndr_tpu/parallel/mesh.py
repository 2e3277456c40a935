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


def make_sharded_apply_k(sg: ShardedGrid, K0: np.ndarray):
    """Per-shard stiffness apply: local matrix-free apply + halo sum."""
    local_grid = sg.local_grid

    def apply_k_shard(u_local, young_local):
        f = ops.apply_k(u_local, young_local, K0, local_grid)
        return halo_sum_forces(f)

    return apply_k_shard


def psum_vdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Global dot product over slabs, not double-counting the duplicated
    boundary plane (owned by the left shard)."""
    idx = jax.lax.axis_index(AXIS)
    w = jnp.ones_like(a)
    w = w.at[0].set(jnp.where(idx > 0, 0.0, 1.0))
    return jax.lax.psum(jnp.vdot(a * w, b), AXIS)


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
            return zero_d(jnp.einsum("...ij,...j->...i", inv, r))

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
