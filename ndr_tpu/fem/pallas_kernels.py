"""Pallas TPU kernels for the hot stiffness operator.

The XLA path (ndr_tpu.fem.operators.apply_k) materializes the
(dofs_pe x num_elements) gathered-displacement and per-element-force
intermediates in HBM — ~25x the traffic of the fields themselves. This
kernel fuses gather -> elementwise K0 contraction -> scatter into one
VMEM pass over x-slabs of the grid:

  * displacement components are passed as separate scalar fields (SoA),
    each **twice** with plain BlockSpecs — the slab block and the
    next-slab block — because a slab needs a one-plane halo that
    overlapping BlockSpecs cannot express; the kernel concatenates the
    loaded values. (Plain BlockSpecs also buy automatic double-buffered
    pipelining, and avoid manual HBM DMA.)
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


def _pad_to_multiple(nx: int, m: int) -> int:
    return (-nx) % m


def _pick_slab_for_vmem(rest_nodes, dtype, requested: int) -> int:
    """Choose the slab thickness so the kernel's scoped-VMEM footprint
    stays within budget. Empirically the footprint is ~12 MB per slab
    plane-set at a 66.5 KB plane (measured on v5e: 106 MB at T=8 with
    (129,129) planes), dominated by double-buffered blocks plus the
    unrolled contraction's live temporaries."""
    plane_bytes = int(np.prod(rest_nodes)) * jnp.dtype(dtype).itemsize
    budget = 60e6
    for T in (requested, 8, 4, 2, 1):
        est = 106e6 * ((T + 1) / 9.0) * (plane_bytes / 66564.0)
        if est <= budget:
            return T
    return 1


def _kernel_body(ndim, npe, T, K0r, rest_elems, refs):
    """One x-slab: assemble the halo'd u slab from the two blocks,
    contract, write partial forces."""
    uA = refs[:ndim]
    uB = refs[ndim: 2 * ndim]
    e_ref = refs[2 * ndim]
    out_refs = refs[2 * ndim + 1:]

    E = e_ref[...]  # (T, rest_elems...)
    offs = list(itertools.product((0, 1), repeat=ndim))

    # full halo'd slab values (T+1 planes) per component
    u_slab = [
        jnp.concatenate([uA[d][...], uB[d][...][:1]], axis=0)
        for d in range(ndim)
    ]

    def view(b, d):
        o = offs[b]
        idx = (slice(o[0], o[0] + T),) + tuple(
            slice(o[k], o[k] + rest_elems[k - 1]) for k in range(1, ndim)
        )
        return u_slab[d][idx]

    u_views = [[view(b, d) for d in range(ndim)] for b in range(npe)]

    for c in range(ndim):
        out_refs[c][...] = jnp.zeros_like(out_refs[c])
    for a in range(npe):            # output local node
        oa = offs[a]
        out_idx = (0, slice(oa[0], oa[0] + T)) + tuple(
            slice(oa[k], oa[k] + rest_elems[k - 1]) for k in range(1, ndim)
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

    # pad the node rows so block (nslabs) of the shifted input exists:
    # rows must reach (nslabs + 1) * T
    row_pad = (nslabs + 1) * T - (nx + 1)
    u_comps = [
        jnp.pad(c, [(0, row_pad)] + [(0, 0)] * (ndim - 1)) for c in u_comps
    ]

    out_shape = [
        jax.ShapeDtypeStruct((nslabs, T + 1) + rest_nodes, dt)
        for _ in range(ndim)
    ]

    kernel = functools.partial(
        _kernel_body, ndim, npe, T, np.asarray(K0r), rest_elems
    )

    def wrapped(*refs):
        kernel(refs)

    def _imap(lead_shift, n_zeros):
        # int32 zeros created inside the map (x64 mode would trace python
        # literals as i64, captured constants are disallowed)
        def imap(i):
            return (i + lead_shift,) + tuple(
                jnp.int32(0) for _ in range(n_zeros)
            )
        return imap

    u_block = (T,) + rest_nodes
    slab_spec = pl.BlockSpec(u_block, _imap(0, ndim - 1))
    next_spec = pl.BlockSpec(u_block, _imap(1, ndim - 1))
    e_spec = pl.BlockSpec((T,) + rest_elems, _imap(0, ndim - 1))
    out_specs = [
        pl.BlockSpec((1, T + 1) + rest_nodes, _imap(0, ndim))
        for _ in range(ndim)
    ]

    outs = pl.pallas_call(
        wrapped,
        out_shape=out_shape,
        grid=(nslabs,),
        in_specs=[slab_spec] * ndim + [next_spec] * ndim + [e_spec],
        out_specs=out_specs,
        # the unrolled contraction keeps several slab-sized temporaries
        # live; the 16MB default scoped-vmem cap is too small in 3D
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*u_comps, *u_comps, young)
    return outs


def apply_k_pallas(u: jnp.ndarray, young: jnp.ndarray, K0, grid: Grid,
                   slab: int = 8, interpret: bool = False) -> jnp.ndarray:
    """Fused matrix-free stiffness apply (TPU Pallas path).

    Drop-in equivalent of :func:`ndr_tpu.fem.operators.apply_k` for
    degree-1 grids; the leading dimension is zero-padded to a multiple
    of `slab` (padded elements carry zero modulus, so they contribute
    nothing).
    """
    if grid.degree != 1:
        raise NotImplementedError("pallas applyK supports degree-1 elements")
    ndim = grid.ndim
    npe = grid.nodes_per_elem
    dt = u.dtype
    K0r = np.asarray(K0, np.float64).reshape(npe, ndim, npe, ndim)

    nx = grid.dims[0]
    rest_nodes = tuple(n + 1 for n in grid.dims[1:])
    T = _pick_slab_for_vmem(rest_nodes, u.dtype, slab)
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
