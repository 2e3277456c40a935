"""Pallas TPU kernels for the hot stiffness operator.

The XLA path (ndr_tpu.fem.operators.apply_k) materializes the
(dofs_pe x num_elements) gathered-displacement and per-element-force
intermediates in HBM — ~25x the traffic of the fields themselves. This
kernel fuses gather -> elementwise K0 contraction -> scatter into one
VMEM pass over x-slabs of the grid:

  * displacement components are passed as separate scalar fields (SoA)
    kept in HBM (`memory_space=ANY`) and DMA'd per slab *with their
    one-plane halo* — overlapping reads that BlockSpecs cannot express;
  * the per-element contraction runs as an unrolled sum of
    scalar-coefficient multiply-adds over the slab (VPU work at full
    lane width; the K0 entries are compile-time constants);
  * each slab writes its partial nodal forces (including both boundary
    planes); adjacent slabs' shared planes are summed by a cheap
    epilogue outside the kernel.

Degree-1 elements (the reference's production configuration,
VoxelFEM.cc:226-228 instantiates degrees (1,1) and (1,1,1) only).
(reference hot loop: TensorProductSimulator::applyK,
TensorProductSimulator.hh:905-952)
"""

from __future__ import annotations

import functools
import itertools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ndr_tpu.grid import Grid


def _pick_slab(nx: int, target: int = 8) -> int:
    """Largest divisor of nx not exceeding `target`."""
    for t in range(min(target, nx), 0, -1):
        if nx % t == 0:
            return t
    return 1


def _pad_to_multiple(nx: int, m: int) -> int:
    return (-nx) % m


def _kernel_body(ndim, npe, T, K0r, rest_nodes, rest_nodes_pad, u_refs,
                 e_ref, out_refs, u_slabs, sem):
    """One x-slab: DMA the halo'd u slab, contract, write partial forces."""
    i = pl.program_id(0)
    start = jnp.int32(i) * jnp.int32(T)
    # ---- DMA u components for this slab (T+1 node planes) --------------
    # (indices kept int32 explicitly: under jax x64 mode python ints would
    #  lower as i64, which Mosaic's memref slicing rejects)
    for d in range(ndim):
        cp = pltpu.make_async_copy(
            u_refs[d].at[pl.ds(start, T + 1)], u_slabs[d],
            sem.at[jnp.int32(d)],
        )
        cp.start()
    for d in range(ndim):
        pltpu.make_async_copy(
            u_refs[d].at[pl.ds(start, T + 1)], u_slabs[d],
            sem.at[jnp.int32(d)],
        ).wait()

    E = e_ref[...]  # (T, rest_elems...) element moduli of this slab

    offs = list(itertools.product((0, 1), repeat=ndim))

    def u_at(b, d):
        """Displacement component d at local node b for every element."""
        o = offs[b]
        idx = (pl.ds(o[0], T),) + tuple(
            pl.ds(o[k], rest_nodes[k - 1] - 1) for k in range(1, ndim)
        )
        return u_slabs[d][idx]

    # cache the 2^N * N shifted element views once
    u_views = [[u_at(b, d) for d in range(ndim)] for b in range(npe)]

    for a in range(npe):            # output local node
        oa = offs[a]
        # out blocks carry a leading slab axis of extent 1
        out_idx = (0, pl.ds(oa[0], T)) + tuple(
            pl.ds(oa[k], rest_nodes[k - 1] - 1) for k in range(1, ndim)
        )
        for c in range(ndim):       # output component
            acc = None
            for b in range(npe):
                for d in range(ndim):
                    k = float(K0r[a, c, b, d])
                    if k == 0.0:
                        continue
                    term = k * u_views[b][d]
                    acc = term if acc is None else acc + term
            contrib = E * acc
            cur = out_refs[c][out_idx]
            out_refs[c][out_idx] = cur + contrib


def _apply_k_pallas_partial(u_comps, young, K0r, grid: Grid, T: int,
                            interpret: bool = False):
    """Returns per-component partial forces of shape (nslabs, T+1, rest...)."""
    ndim = grid.ndim
    npe = grid.nodes_per_elem
    nx = grid.dims[0]
    nslabs = nx // T
    rest_elems = grid.dims[1:]
    rest_nodes = tuple(n + 1 for n in rest_elems)
    dt = u_comps[0].dtype

    # Mosaic requires manual HBM->VMEM DMA slices to be lane-aligned in
    # the minor dimension: pad the trailing node dim to a 128 multiple
    lane_pad = (-rest_nodes[-1]) % 128
    rest_nodes_pad = rest_nodes[:-1] + (rest_nodes[-1] + lane_pad,)
    if lane_pad:
        padding = [(0, 0)] * ndim
        padding[-1] = (0, lane_pad)
        u_comps = [jnp.pad(c, padding) for c in u_comps]

    out_shape = [
        jax.ShapeDtypeStruct((nslabs, T + 1) + rest_nodes, dt)
        for _ in range(ndim)
    ]

    kernel = functools.partial(
        _kernel_body, ndim, npe, T, np.asarray(K0r), rest_nodes,
        rest_nodes_pad,
    )

    def wrapped(*refs):
        u_refs = refs[:ndim]
        e_ref = refs[ndim]
        out_refs = refs[ndim + 1: 2 * ndim + 1]
        scratch = refs[2 * ndim + 1:]
        u_slabs, sem = scratch[:-1], scratch[-1]
        # zero-init outputs (grid dim iterates slabs; each block fresh)
        for r in out_refs:
            r[...] = jnp.zeros_like(r)
        kernel(u_refs, e_ref, out_refs, u_slabs, sem)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nslabs,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.ANY)] * ndim     # u comps (HBM)
            + [
                pl.BlockSpec(
                    (T,) + rest_elems,
                    # literal zeros must be int32: under jax x64 mode a
                    # python 0 traces as i64, which Mosaic rejects
                    lambda i: (i,) + (jnp.int32(0),) * (ndim - 1),
                )
            ]
        ),
        out_specs=[
            pl.BlockSpec(
                (1, T + 1) + rest_nodes,
                lambda i: (i,) + (jnp.int32(0),) * ndim,
            )
            for _ in range(ndim)
        ],
        scratch_shapes=[
            pltpu.VMEM((T + 1,) + rest_nodes_pad, dt) for _ in range(ndim)
        ]
        + [pltpu.SemaphoreType.DMA((ndim,))],
    )

    outs = pl.pallas_call(
        wrapped,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(*u_comps, young)
    return outs


def apply_k_pallas(u: jnp.ndarray, young: jnp.ndarray, K0, grid: Grid,
                   slab: int = 8, interpret: bool = False) -> jnp.ndarray:
    """Fused matrix-free stiffness apply (TPU Pallas path).

    Drop-in equivalent of :func:`ndr_tpu.fem.operators.apply_k` for
    degree-1 grids whose leading dimension divides by `slab`.
    """
    if grid.degree != 1:
        raise NotImplementedError("pallas applyK supports degree-1 elements")
    ndim = grid.ndim
    npe = grid.nodes_per_elem
    dt = u.dtype
    K0r = np.asarray(K0, np.float64).reshape(npe, ndim, npe, ndim)

    # Mosaic requires the slab (second-to-last in 2D) block dim to be a
    # sublane multiple; pad the leading dimension with zero-modulus
    # elements up to a multiple of `slab` (their contributions vanish)
    nx = grid.dims[0]
    T = slab
    pad = _pad_to_multiple(nx, T)
    if pad:
        grid = grid.with_dims((nx + pad,) + grid.dims[1:])
        u = jnp.pad(u, [(0, pad)] + [(0, 0)] * (u.ndim - 1))
        young = jnp.pad(young, [(0, pad)] + [(0, 0)] * (young.ndim - 1))

    u_comps = [u[..., d] for d in range(ndim)]
    outs = _apply_k_pallas_partial(u_comps, young.astype(dt), K0r, grid, T,
                                   interpret=interpret)

    # epilogue: stitch slabs, summing the shared boundary planes
    nslabs = grid.dims[0] // T
    comps = []
    for d in range(ndim):
        partial = outs[d]  # (nslabs, T+1, rest_nodes...)
        body = partial[:, :T].reshape((nslabs * T,) + partial.shape[2:])
        # add each slab's last plane onto the next slab's first plane
        last = partial[:, T]                 # (nslabs, rest...)
        full = jnp.concatenate([body, last[-1][None]], axis=0)
        if nslabs > 1:
            # interior shared planes: slab i's last plane adds onto
            # slab i+1's first plane (rows T, 2T, ..., (nslabs-1)T)
            full = full.at[T: nslabs * T: T].add(last[:-1])
        comps.append(full[: nx + 1])         # drop padded node planes
    return jnp.stack(comps, axis=-1)
