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


def _vmem_plane_bytes(rest, dtype) -> int:
    """Bytes of one (rest...) plane as laid out in VMEM: the minor-2 dims
    are tiled (8, 128) for fp32, so each is padded up accordingly."""
    rest = tuple(int(r) for r in rest)
    if len(rest) == 1:
        padded = (-(-rest[0] // 128) * 128,)
    else:
        padded = rest[:-2] + (
            -(-rest[-2] // 8) * 8,
            -(-rest[-1] // 128) * 128,
        )
    return int(np.prod(padded)) * jnp.dtype(dtype).itemsize


def _pick_slab_for_vmem(rest_nodes, dtype, requested: int) -> int:
    """Choose the slab thickness so the kernel's scoped-VMEM footprint
    stays within budget. Empirically the footprint is ~12 MB per slab
    plane-set at a 66.5 KB plane (measured on v5e: 106 MB at T=8 with
    (129,129) planes), dominated by double-buffered blocks plus the
    unrolled contraction's live temporaries."""
    plane_bytes = _vmem_plane_bytes(rest_nodes, dtype)
    budget = 60e6
    for T in (requested, 8, 4, 2, 1):
        est = 106e6 * ((T + 1) / 9.0) * (plane_bytes / 66564.0)
        if est <= budget:
            return T
    return 1


def _kernel_body(ndim, npe, T, K0r, rest_elems, refs):
    """One x-slab of the trailing-aligned kernel.

    Inputs arrive pre-sliced into 2^(ndim-1) trailing-offset *variants*
    (see :func:`apply_k_pallas`): variant v = (o1, .., o_{ndim-1}) holds
    u[:, o1:o1+n1, .., d] with ELEMENT-shaped trailing dims, so every
    in-kernel view is a full-width, lane-aligned block — no misaligned
    lane slices, no (2^k+1)-plane padding waste. Only the leading (x)
    dim is sliced in-kernel (free: it is a major dim).
    """
    nv = 1 << (ndim - 1)
    n_in = nv * ndim
    uA = refs[:n_in]
    uB = refs[n_in: 2 * n_in]
    e_ref = refs[2 * n_in]
    out_refs = refs[2 * n_in + 1:]

    E = e_ref[...]  # (T, rest_elems...)
    offs = list(itertools.product((0, 1), repeat=ndim))
    tvars = list(itertools.product((0, 1), repeat=ndim - 1))

    # full halo'd slab values (T+1 rows) per (variant, component)
    u_slab = [
        jnp.concatenate([uA[i][...], uB[i][...][:1]], axis=0)
        for i in range(n_in)
    ]

    def view(b, d):
        o = offs[b]
        vi = tvars.index(tuple(o[1:]))
        return u_slab[vi * ndim + d][o[0]: o[0] + T]

    u_views = [[view(b, d) for d in range(ndim)] for b in range(npe)]

    for r in out_refs:
        r[...] = jnp.zeros_like(r)
    for a in range(npe):            # output local node
        oa = offs[a]
        vi = tvars.index(tuple(oa[1:]))
        out_idx = (0, slice(oa[0], oa[0] + T))
        for c in range(ndim):       # output component
            acc = None
            for b in range(npe):
                for d in range(ndim):
                    k = float(K0r[a, c, b, d])
                    if k == 0.0:
                        continue
                    term = k * u_views[b][d]
                    acc = term if acc is None else acc + term
            ref = out_refs[vi * ndim + c]
            cur = ref[out_idx]
            ref[out_idx] = cur + E * acc


def _variant_slices(u, grid: Grid, ndim: int):
    """Slice a node field (nodes..., [comp]) into the 2^(ndim-1)
    trailing-offset variants x ndim components, each with element-shaped
    trailing dims (C order over the trailing offset tuple)."""
    rest_elems = grid.dims[1:]
    out = []
    for tv in itertools.product((0, 1), repeat=ndim - 1):
        for d in range(ndim):
            sl = (slice(None),) + tuple(
                slice(o, o + n) for o, n in zip(tv, rest_elems)
            ) + (d,)
            out.append(u[sl])
    return out


def _stitch_partials(outs, grid: Grid, nx_out: int, T: int):
    """Combine per-(variant, comp) partial forces into the node field:
    x-stitch the slab boundary planes, then offset-add the trailing-dim
    variants (node = element + offset per trailing dim)."""
    ndim = grid.ndim
    nslabs = grid.dims[0] // T
    tvars = list(itertools.product((0, 1), repeat=ndim - 1))
    comps = []
    for d in range(ndim):
        total = None
        for vi, tv in enumerate(tvars):
            partial = outs[vi * ndim + d]   # (nslabs, T+1, rest_elems...)
            body = partial[:, :T].reshape((nslabs * T,) + partial.shape[2:])
            last = partial[:, T]            # (nslabs, rest...)
            full = jnp.concatenate([body, last[-1][None]], axis=0)
            if nslabs > 1:
                # slab i's last plane adds onto slab i+1's first plane
                full = full.at[T: nslabs * T: T].add(last[:-1])
            full = full[: nx_out + 1]       # drop padded x planes
            # element position e contributes to node e + tv per trailing dim
            pad = [(0, 0)] + [(o, 1 - o) for o in tv]
            p = jnp.pad(full, pad)
            total = p if total is None else total + p
        comps.append(total)
    return jnp.stack(comps, axis=-1)


def _apply_k_pallas_partial(u_vars, young, K0r, grid: Grid, T: int,
                            interpret: bool = False):
    """Returns per-(variant, comp) partial forces, each of shape
    (nslabs, T+1, rest_elems...)."""
    ndim = grid.ndim
    npe = grid.nodes_per_elem
    nv = 1 << (ndim - 1)
    nx = grid.dims[0]
    nslabs = nx // T
    rest_elems = grid.dims[1:]
    dt = u_vars[0].dtype

    # pad the node rows so block (nslabs) of the shifted input exists:
    # rows must reach (nslabs + 1) * T
    row_pad = (nslabs + 1) * T - (nx + 1)
    u_vars = [
        jnp.pad(c, [(0, row_pad)] + [(0, 0)] * (ndim - 1)) for c in u_vars
    ]

    out_shape = [
        jax.ShapeDtypeStruct((nslabs, T + 1) + rest_elems, dt)
        for _ in range(nv * ndim)
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

    u_block = (T,) + rest_elems
    slab_spec = pl.BlockSpec(u_block, _imap(0, ndim - 1))
    next_spec = pl.BlockSpec(u_block, _imap(1, ndim - 1))
    e_spec = pl.BlockSpec((T,) + rest_elems, _imap(0, ndim - 1))
    out_specs = [
        pl.BlockSpec((1, T + 1) + rest_elems, _imap(0, ndim))
        for _ in range(nv * ndim)
    ]

    outs = pl.pallas_call(
        wrapped,
        out_shape=out_shape,
        grid=(nslabs,),
        in_specs=[slab_spec] * (nv * ndim) + [next_spec] * (nv * ndim)
        + [e_spec],
        out_specs=out_specs,
        # the unrolled contraction keeps several slab-sized temporaries
        # live; the 16MB default scoped-vmem cap is too small in 3D
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*u_vars, *u_vars, young)
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
    T = _pick_slab_for_vmem(grid.dims[1:], u.dtype, slab)
    pad = _pad_to_multiple(nx, T)
    if pad:
        grid = grid.with_dims((nx + pad,) + grid.dims[1:])
        u = jnp.pad(u, [(0, pad)] + [(0, 0)] * (u.ndim - 1))
        young = jnp.pad(young, [(0, pad)] + [(0, 0)] * (young.ndim - 1))

    u_vars = _variant_slices(u, grid, ndim)
    outs = _apply_k_pallas_partial(u_vars, young.astype(dt), K0r, grid, T,
                                   interpret=interpret)
    return _stitch_partials(outs, grid, nx, T)


# ---------------------------------------------------------------------------
# Flattened single-copy stiffness apply (v2 of the fine kernel).
#
# The variant-sliced kernel above reaches correctness by materializing
# 2^(ndim-1) trailing-offset COPIES of every displacement component
# (each read twice through the slab/next-slab specs) and emitting
# 2^(ndim-1) x ndim partial outputs that a multi-pass XLA epilogue
# stitches — ~8x the fields' own HBM traffic at 4M voxels (measured
# 5.7 ms vs ~0.5 ms speed-of-light). This kernel keeps ONE copy of each
# component with the trailing node dims flattened to a single
# lane-padded axis Rn (129x129 -> 16641 -> 16768: +0.8% pad, vs ~2x for
# lane-padding each 129 plane):
#
#   * stencil neighbor access is a LANE ROLL by the flattened offset
#     (z-neighbor: 1, y-neighbor: nz_n, ...) — circular wrap is safe
#     because every wrapped-in lane multiplies a zero modulus (young is
#     laid out on the node plane with zeros at non-element lanes);
#   * scatter to the 2^ndim output corners is the inverse roll of the
#     per-element force, accumulated in registers and written ONCE per
#     slab (T rows);
#   * the x-boundary plane each slab shares with its successor rides a
#     VMEM carry scratch across the sequential TPU grid — no partial
#     outputs, no stitch epilogue.
#
# HBM per apply = u (2x: halo'd specs) + young + f written once
# ~= 5 field passes vs the variant kernel's ~18.
# (reference hot loop: TensorProductSimulator::applyK,
# TensorProductSimulator.hh:905-952)
# ---------------------------------------------------------------------------


def _flat_strides(node_dims_rest) -> list:
    """Flattened-lane stride of one step along each trailing node dim."""
    strides = []
    s = 1
    for n in reversed(node_dims_rest):
        strides.append(s)
        s *= n
    return list(reversed(strides))


def _flat_kernel_body(ndim, npe, T, K0r, Rn, troffs, interpret, refs):
    """One x-slab over the flattened node plane.

    refs: ndim slab u blocks, ndim next-slab u blocks, young block,
    ndim output blocks, carry scratch (ndim, Rn)."""
    uA = refs[:ndim]
    uB = refs[ndim: 2 * ndim]
    e_ref = refs[2 * ndim]
    out_refs = refs[2 * ndim + 1: 3 * ndim + 1]
    carry_ref = refs[3 * ndim + 1]

    def roll(x, shift):
        if shift % Rn == 0:
            return x
        if interpret:
            return jnp.roll(x, shift, axis=1)
        # NB: int32 constant — under jax_enable_x64 a bare Python int
        # lowers as i64 and tpu.dynamic_rotate rejects non-i32 shifts.
        return pltpu.roll(x, jnp.int32(shift % Rn), axis=1)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    E = e_ref[...]                                  # (T, Rn)
    u_slab = [
        jnp.concatenate([uA[d][...], uB[d][...][:1]], axis=0)
        for d in range(ndim)
    ]                                               # (T+1, Rn) each

    # local-node offset tuples and their (trailing-offset tuple -> flat
    # lane shift) map; troffs is [(trailing_tuple, lane_shift), ...]
    offs = list(itertools.product((0, 1), repeat=ndim))

    # gathered input views: roll(u, -off) brings node lane r+off to
    # element lane r; keyed by (trailing-offset tuple, component)
    gath = {}
    for tt, sh in troffs:
        for d in range(ndim):
            gath[tt, d] = roll(u_slab[d], -sh)

    zrow = jnp.zeros((1, Rn), E.dtype)
    for c in range(ndim):
        acc_c = None                                # (T+1, Rn)
        for tt, sh in troffs:
            # both output local nodes sharing this trailing offset
            cd = None                               # pre-roll (T+1, Rn)
            for ax in (0, 1):
                a = offs.index((ax,) + tt)
                X = None
                for b in range(npe):
                    ob = offs[b]
                    for d in range(ndim):
                        k = float(K0r[a, c, b, d])
                        if k == 0.0:
                            continue
                        term = k * gath[ob[1:], d][ob[0]: ob[0] + T]
                        X = term if X is None else X + term
                contrib = E * X                     # (T, Rn)
                placed = (jnp.concatenate([contrib, zrow], axis=0)
                          if ax == 0 else
                          jnp.concatenate([zrow, contrib], axis=0))
                cd = placed if cd is None else cd + placed
            cd = roll(cd, sh)                       # scatter offset
            acc_c = cd if acc_c is None else acc_c + cd
        out_refs[c][...] = jnp.concatenate(
            [acc_c[:1] + carry_ref[c][None], acc_c[1:T]], axis=0)
        carry_ref[c, :] = acc_c[T]


def _pick_slab_flat(Rn: int, requested: int) -> int:
    """Slab thickness for the flat kernel: the live set is ~40 slab
    planes (blocks + rolled views + accumulators), all (T+1, Rn) f32.
    T=8 is the floor (f32 sublane tile); grids whose flattened trailing
    plane exceeds the budget even at T=8 (~55k lanes, i.e. ~512^2
    trailing dims) would need an Rn-tiled 2-D kernel grid — out of scope
    for the shapes this framework targets (<= 320x160x80-class)."""
    budget = 80e6
    for T in (requested, 16, 8):
        if 40 * (T + 1) * Rn * 4 <= budget:
            return max(T, 8)
    return 8


def apply_k_pallas_flat(u: jnp.ndarray, young: jnp.ndarray, K0, grid: Grid,
                        slab: int = 8, interpret: bool = False
                        ) -> jnp.ndarray:
    """Fused matrix-free stiffness apply, flattened single-copy layout.

    Drop-in equivalent of :func:`ndr_tpu.fem.operators.apply_k` /
    :func:`apply_k_pallas` for degree-1 grids (fp32). See the design
    comment block above.
    """
    if grid.degree != 1:
        raise NotImplementedError("pallas applyK supports degree-1 elements")
    ndim = grid.ndim
    npe = grid.nodes_per_elem
    dt = u.dtype
    K0r = np.asarray(K0, np.float64).reshape(npe, ndim, npe, ndim)

    node_dims = grid.nodes_per_dim
    nx = grid.dims[0]
    rest_nodes = node_dims[1:]
    Rn_real = int(np.prod(rest_nodes))
    Rn = -(-Rn_real // 128) * 128
    strides = _flat_strides(rest_nodes)
    troffs = [
        (tt, int(sum(o * s for o, s in zip(tt, strides))))
        for tt in itertools.product((0, 1), repeat=ndim - 1)
    ]

    T = _pick_slab_flat(Rn, slab)
    nslabs = -(-(nx + 1) // T)
    rows_out = nslabs * T
    rows_in = (nslabs + 1) * T

    # flattened, lane-padded per-component node fields
    u_flat = []
    for d in range(ndim):
        c = u[..., d].reshape(node_dims[0], Rn_real)
        c = jnp.pad(c, [(0, rows_in - node_dims[0]), (0, Rn - Rn_real)])
        u_flat.append(c)
    # young on the node plane: zeros at non-element lanes/rows
    e_np = jnp.pad(
        young,
        [(0, rows_out - nx)] + [
            (0, nn - ne) for nn, ne in zip(rest_nodes, grid.dims[1:])
        ],
    ).reshape(rows_out, Rn_real)
    e_np = jnp.pad(e_np, [(0, 0), (0, Rn - Rn_real)]).astype(dt)

    kernel = functools.partial(
        _flat_kernel_body, ndim, npe, T, np.asarray(K0r), Rn, troffs,
        interpret
    )

    def wrapped(*refs):
        kernel(refs)

    def _imap(lead_shift):
        def imap(i):
            return (i + lead_shift, jnp.int32(0))
        return imap

    spec = pl.BlockSpec((T, Rn), _imap(0))
    next_spec = pl.BlockSpec((T, Rn), _imap(1))
    out_shape = [
        jax.ShapeDtypeStruct((rows_out, Rn), dt) for _ in range(ndim)
    ]

    outs = pl.pallas_call(
        wrapped,
        out_shape=out_shape,
        grid=(nslabs,),
        in_specs=[spec] * ndim + [next_spec] * ndim + [spec],
        out_specs=[spec] * ndim,
        scratch_shapes=[pltpu.VMEM((ndim, Rn), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*u_flat, *u_flat, e_np)

    f = jnp.stack(
        [o[: node_dims[0], :Rn_real] for o in outs], axis=-1
    )
    return f.reshape(node_dims + (ndim,))
#
# The mixed-precision refinement loop (multigrid._mgpcg_solve_refined)
# needs ONE true residual r = b - K u per solve, accurate well below the
# fp32 noise floor eps*|K||u| (cancellation in the assembly makes |r|
# orders of magnitude smaller than the local element forces). XLA's
# float64 apply delivers that via software-emulated f64 — measured
# 262 ms vs 6.8 ms for the fp32 Pallas apply at 4.19M voxels. This
# kernel reaches ~1e-11 relative accuracy with fp32 vector arithmetic:
#
#   * u and young travel as (hi, lo) fp32 pairs (an exact split of the
#     f64 values);
#   * each K0 coefficient is split at trace time into k_hi + k_lo
#     (exact), and k_hi further bitmask-split into 12-bit halves so all
#     large products are EXACT half-products (12bit x 12bit fits fp32);
#   * exact half-products accumulate with Knuth TwoSum on the high
#     parts; all small terms (cross half-products, k_hi*u_lo, k_lo*u_hi,
#     young cross terms) accumulate in a separate low register whose
#     naive adds set the ~2^-36-of-local-magnitude accuracy floor.
#
# Per-element cost is ~10x the plain fp32 contraction — still ~4x
# cheaper than emulated f64, and it keeps the fused single-pass HBM
# profile.
# ---------------------------------------------------------------------------

# COMPILER-SAFETY NOTE. Classic error-free transforms (Dekker TwoProd,
# Veltkamp splitting) assume every consumer of a product sees the SAME
# rounded value. XLA's fusion DUPLICATION breaks that: a producer like
# p = kh*v is freely re-materialized inside several consumer fusions,
# and each copy may contract into an FMA (unrounded product) -- so "p"
# has multiple inconsistent realizations and the extracted error terms
# are garbage. Measured: the Dekker formulation loses its entire
# correction under jit (7.6e-8 rel err -- the plain fp32 noise floor --
# vs 1.7e-12 evaluated eagerly), and optimization_barrier does NOT stop
# fusion duplication. The formulation below is immune BY CONSTRUCTION:
#
#   * operands are split with BITMASK splitting (integer and), which
#     contains no mul+add pattern to contract and recomputes
#     bit-identically;
#   * the only products that must be error-free are 12bit x 12bit =
#     exact in fp32 -- an FMA contraction of an exact product changes
#     nothing;
#   * TwoSum chains are pure adds/subs, which also recompute
#     bit-identically.
#
# Inexact products appear only on terms whose magnitude is already
# O(eps) relative (k_hi*u_lo etc.), where a contraction-induced ulp
# wobble is O(eps^2).

_MASK12 = np.uint32(0xFFFFF000)  # sign + exponent + top 11 mantissa bits


def _split12(x):
    """Exact split x = x1 + x2, each half a <=12-bit mantissa (fp32).

    x1 truncates the low 12 mantissa bits; x2 = x - x1 is exact, so
    products of two halves are exactly representable in fp32."""
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    x1 = jax.lax.bitcast_convert_type(xi & _MASK12, jnp.float32)
    return x1, x - x1


def _split12_const(k) -> tuple:
    """Trace-time bitmask split of an fp32 constant."""
    k = np.float32(k)
    k1 = np.frombuffer(
        (np.frombuffer(k.tobytes(), np.uint32) & _MASK12).tobytes(),
        np.float32,
    )[0]
    return k1, np.float32(k - k1)


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (pure adds: fusion-safe)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _df_kernel_body(ndim, npe, T, K0r, rest_elems, refs):
    """One x-slab of the two-float stiffness apply (trailing-aligned
    variant layout, see :func:`_kernel_body`)."""
    nv = 1 << (ndim - 1)
    n_in = nv * 2 * ndim  # (hi, lo) per component per trailing variant
    uA = refs[:n_in]
    uB = refs[n_in: 2 * n_in]
    yh_ref, yl_ref = refs[2 * n_in], refs[2 * n_in + 1]
    out_refs = refs[2 * n_in + 2:]   # nv * ndim (hi, lo) pairs interleaved

    Eh, El = yh_ref[...], yl_ref[...]
    offs = list(itertools.product((0, 1), repeat=ndim))
    tvars = list(itertools.product((0, 1), repeat=ndim - 1))

    u_slab = [
        jnp.concatenate([uA[i][...], uB[i][...][:1]], axis=0)
        for i in range(n_in)
    ]

    def view(b, i):
        # i = 2*d (+1 for the lo stream)
        o = offs[b]
        vi = tvars.index(tuple(o[1:]))
        return u_slab[vi * 2 * ndim + i][o[0]: o[0] + T]

    # per-(b,d) element views of u_hi (with their 12-bit halves) / u_lo
    uh, uh1, uh2, ul = {}, {}, {}, {}
    for b in range(npe):
        for d in range(ndim):
            v = view(b, 2 * d)
            uh[b, d] = v
            uh1[b, d], uh2[b, d] = _split12(v)
            ul[b, d] = view(b, 2 * d + 1)

    # 12-bit halves of the young high part (shared by all 24 outputs)
    Eh1, Eh2 = _split12(Eh)

    for r in out_refs:
        r[...] = jnp.zeros_like(r)

    for a in range(npe):
        oa = offs[a]
        vi = tvars.index(tuple(oa[1:]))
        out_idx = (0, slice(oa[0], oa[0] + T))
        for c in range(ndim):
            S = None   # high accumulator (TwoSum chain of exact products)
            L = None   # low accumulator (small terms, naive adds)
            for b in range(npe):
                for d in range(ndim):
                    k64 = float(K0r[a, c, b, d])
                    if k64 == 0.0:
                        continue
                    kh = np.float32(k64)
                    kl = np.float32(k64 - float(kh))
                    k1, k2 = _split12_const(kh)
                    v, v1, v2, vl = uh[b, d], uh1[b, d], uh2[b, d], ul[b, d]
                    # four exact half-products; only h11 is large
                    h11 = k1 * v1
                    small = (k1 * v2 + k2 * v1) + k2 * v2 + kh * vl
                    if kl != 0.0:
                        small = small + kl * v
                    if S is None:
                        S, L = h11, small
                    else:
                        S, err = _two_sum(S, h11)
                        L = L + (err + small)
            # F = (Eh + El) * (S + L) via exact half-products
            S1, S2 = _split12(S)
            P = Eh1 * S1
            Flo = (Eh1 * S2 + Eh2 * S1) + Eh2 * S2 + Eh * L + El * S
            # accumulate into the (hi, lo) output with a TwoSum carry
            hi_ref = out_refs[vi * 2 * ndim + 2 * c]
            lo_ref = out_refs[vi * 2 * ndim + 2 * c + 1]
            cur = hi_ref[out_idx]
            s, err = _two_sum(cur, P)
            hi_ref[out_idx] = s
            lo_ref[out_idx] = lo_ref[out_idx] + (err + Flo)


def apply_k_pallas_df(u_hi, u_lo, young_hi, young_lo, K0, grid: Grid,
                      slab: int = 8, interpret: bool = False):
    """Two-float fused stiffness apply: returns (f_hi, f_lo) fp32 arrays
    whose (f64) sum matches the float64 ``operators.apply_k`` to ~1e-11
    relative (floor: 2^-36 of the local force magnitude — the lo stream
    accumulates naively; see the compiler-safety note above).

    Inputs are exact fp32 splits: ``u = u_hi + u_lo`` (nodes..., N),
    ``young = young_hi + young_lo`` (dims...). See the module comment
    block; used by the mixed-precision refinement's true-residual
    measurement (reference criterion: MultigridSolver.hh:704-708).
    """
    if grid.degree != 1:
        raise NotImplementedError("pallas applyK supports degree-1 elements")
    ndim = grid.ndim
    npe = grid.nodes_per_elem
    K0r = np.asarray(K0, np.float64).reshape(npe, ndim, npe, ndim)

    nx = grid.dims[0]
    nv = 1 << (ndim - 1)
    # double the modeled plane footprint: hi+lo streams and the split
    # temporaries roughly double the scoped-VMEM pressure vs fp32
    T = _pick_slab_for_vmem(grid.dims[1:], np.float64, slab)
    pad = _pad_to_multiple(nx, T)
    if pad:
        grid = grid.with_dims((nx + pad,) + grid.dims[1:])
        padn = [(0, pad)] + [(0, 0)] * (u_hi.ndim - 1)
        pade = [(0, pad)] + [(0, 0)] * (young_hi.ndim - 1)
        u_hi, u_lo = jnp.pad(u_hi, padn), jnp.pad(u_lo, padn)
        young_hi, young_lo = jnp.pad(young_hi, pade), jnp.pad(young_lo, pade)

    nslabs = grid.dims[0] // T
    rest_elems = grid.dims[1:]
    f32 = jnp.float32
    # variant-sliced inputs, (hi, lo) interleaved per component: stack the
    # hi/lo streams as a trailing axis so _variant_slices' component
    # indexing yields [v0: h0,l0,h1,l1,h2,l2, v1: ...]
    uhl = jnp.stack(
        sum(([u_hi[..., d].astype(f32), u_lo[..., d].astype(f32)]
             for d in range(ndim)), []),
        axis=-1,
    )
    u_vars = []
    for tv in itertools.product((0, 1), repeat=ndim - 1):
        for i in range(2 * ndim):
            sl = (slice(None),) + tuple(
                slice(o, o + n) for o, n in zip(tv, rest_elems)
            ) + (i,)
            u_vars.append(uhl[sl])

    row_pad = (nslabs + 1) * T - (grid.dims[0] + 1)
    u_vars = [
        jnp.pad(c, [(0, row_pad)] + [(0, 0)] * (ndim - 1)) for c in u_vars
    ]

    out_shape = [
        jax.ShapeDtypeStruct((nslabs, T + 1) + rest_elems, f32)
        for _ in range(nv * 2 * ndim)
    ]

    kernel = functools.partial(
        _df_kernel_body, ndim, npe, T, K0r, rest_elems
    )

    def wrapped(*refs):
        kernel(refs)

    def _imap(lead_shift, n_zeros):
        def imap(i):
            return (i + lead_shift,) + tuple(
                jnp.int32(0) for _ in range(n_zeros)
            )
        return imap

    u_block = (T,) + rest_elems
    slab_spec = pl.BlockSpec(u_block, _imap(0, ndim - 1))
    next_spec = pl.BlockSpec(u_block, _imap(1, ndim - 1))
    e_spec = pl.BlockSpec((T,) + rest_elems, _imap(0, ndim - 1))
    out_specs = [
        pl.BlockSpec((1, T + 1) + rest_elems, _imap(0, ndim))
        for _ in range(nv * 2 * ndim)
    ]

    outs = pl.pallas_call(
        wrapped,
        out_shape=out_shape,
        grid=(nslabs,),
        in_specs=[slab_spec] * (nv * 2 * ndim) + [next_spec] * (nv * 2 * ndim)
        + [e_spec, e_spec],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*u_vars, *u_vars, young_hi.astype(f32), young_lo.astype(f32))

    # epilogue in f64 (a handful of plane adds): combine each variant's
    # hi+lo — exactness of the fp32 carry chain ends here anyway — then
    # x-stitch and offset-add the trailing-dim variants
    tvars = list(itertools.product((0, 1), repeat=ndim - 1))
    comps = []
    for d in range(ndim):
        total = None
        for vi, tv in enumerate(tvars):
            partial = (outs[vi * 2 * ndim + 2 * d].astype(jnp.float64)
                       + outs[vi * 2 * ndim + 2 * d + 1].astype(jnp.float64))
            body = partial[:, :T].reshape((nslabs * T,) + partial.shape[2:])
            last = partial[:, T]
            full = jnp.concatenate([body, last[-1][None]], axis=0)
            if nslabs > 1:
                full = full.at[T: nslabs * T: T].add(last[:-1])
            full = full[: nx + 1]
            p = jnp.pad(full, [(0, 0)] + [(o, 1 - o) for o in tv])
            total = p if total is None else total + p
        comps.append(total)
    return jnp.stack(comps, axis=-1)


def _flat_df_kernel_body(ndim, npe, T, K0r, Rn, troffs, interpret, refs):
    """Two-float x-slab over the flattened node plane (flat-layout twin
    of :func:`_df_kernel_body`; same error-free-transform rules, see the
    compiler-safety note above)."""
    uh_refs = refs[:ndim]
    ul_refs = refs[ndim: 2 * ndim]
    uhB = refs[2 * ndim: 3 * ndim]
    ulB = refs[3 * ndim: 4 * ndim]
    yh_ref, yl_ref = refs[4 * ndim], refs[4 * ndim + 1]
    out_refs = refs[4 * ndim + 2: 6 * ndim + 2]   # hi0..hiN, lo0..loN
    carry_ref = refs[6 * ndim + 2]                # (2*ndim, Rn)

    def roll(x, shift):
        if shift % Rn == 0:
            return x
        if interpret:
            return jnp.roll(x, shift, axis=1)
        # NB: int32 constant — under jax_enable_x64 a bare Python int
        # lowers as i64 and tpu.dynamic_rotate rejects non-i32 shifts.
        return pltpu.roll(x, jnp.int32(shift % Rn), axis=1)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    Eh, El = yh_ref[...], yl_ref[...]
    Eh1, Eh2 = _split12(Eh)
    u_hi = [
        jnp.concatenate([uh_refs[d][...], uhB[d][...][:1]], axis=0)
        for d in range(ndim)
    ]
    u_lo = [
        jnp.concatenate([ul_refs[d][...], ulB[d][...][:1]], axis=0)
        for d in range(ndim)
    ]

    offs = list(itertools.product((0, 1), repeat=ndim))
    gat_h, gat_l = {}, {}
    for tt, sh in troffs:
        for d in range(ndim):
            gat_h[tt, d] = roll(u_hi[d], -sh)
            gat_l[tt, d] = roll(u_lo[d], -sh)

    zrow = jnp.zeros((1, Rn), jnp.float32)
    for c in range(ndim):
        acc_h = None                                # (T+1, Rn)
        acc_l = None
        for tt, sh in troffs:
            for ax in (0, 1):
                a = offs.index((ax,) + tt)
                S, L = None, None
                for b in range(npe):
                    ob = offs[b]
                    for d in range(ndim):
                        k64 = float(K0r[a, c, b, d])
                        if k64 == 0.0:
                            continue
                        kh = np.float32(k64)
                        kl = np.float32(k64 - float(kh))
                        k1, k2 = _split12_const(kh)
                        v = gat_h[ob[1:], d][ob[0]: ob[0] + T]
                        vl = gat_l[ob[1:], d][ob[0]: ob[0] + T]
                        v1, v2 = _split12(v)
                        h11 = k1 * v1
                        small = (k1 * v2 + k2 * v1) + k2 * v2 + kh * vl
                        if kl != 0.0:
                            small = small + kl * v
                        if S is None:
                            S, L = h11, small
                        else:
                            S, err = _two_sum(S, h11)
                            L = L + (err + small)
                S1, S2 = _split12(S)
                P = Eh1 * S1                        # exact product
                Flo = (Eh1 * S2 + Eh2 * S1) + Eh2 * S2 + Eh * L + El * S
                # place at rows [ax:ax+T], scatter-roll by sh, then
                # TwoSum-accumulate (roll/concat move values bit-exactly)
                Ph = roll(jnp.concatenate(
                    [P, zrow] if ax == 0 else [zrow, P], axis=0), sh)
                Pl = roll(jnp.concatenate(
                    [Flo, zrow] if ax == 0 else [zrow, Flo], axis=0), sh)
                if acc_h is None:
                    acc_h, acc_l = Ph, Pl
                else:
                    acc_h, err = _two_sum(acc_h, Ph)
                    acc_l = acc_l + (err + Pl)
        # stitch the x-carry into row 0 with one more TwoSum
        s0, e0 = _two_sum(acc_h[:1], carry_ref[2 * c][None])
        out_refs[c][...] = jnp.concatenate([s0, acc_h[1:T]], axis=0)
        out_refs[ndim + c][...] = jnp.concatenate(
            [acc_l[:1] + carry_ref[2 * c + 1][None] + e0, acc_l[1:T]],
            axis=0)
        carry_ref[2 * c, :] = acc_h[T]
        carry_ref[2 * c + 1, :] = acc_l[T]


def apply_k_pallas_df_flat(u_hi, u_lo, young_hi, young_lo, K0, grid: Grid,
                           slab: int = 8, interpret: bool = False):
    """Two-float fused stiffness apply on the flattened single-copy
    layout: returns the float64 force field (hi+lo combined in the tiny
    epilogue). Accuracy floor matches :func:`apply_k_pallas_df` (~2^-36
    of the local force magnitude)."""
    if grid.degree != 1:
        raise NotImplementedError("pallas applyK supports degree-1 elements")
    ndim = grid.ndim
    npe = grid.nodes_per_elem
    K0r = np.asarray(K0, np.float64).reshape(npe, ndim, npe, ndim)
    f32 = jnp.float32

    node_dims = grid.nodes_per_dim
    nx = grid.dims[0]
    rest_nodes = node_dims[1:]
    Rn_real = int(np.prod(rest_nodes))
    Rn = -(-Rn_real // 128) * 128
    strides = _flat_strides(rest_nodes)
    troffs = [
        (tt, int(sum(o * s for o, s in zip(tt, strides))))
        for tt in itertools.product((0, 1), repeat=ndim - 1)
    ]

    T = _pick_slab_flat(Rn, slab)
    nslabs = -(-(nx + 1) // T)
    rows_out = nslabs * T
    rows_in = (nslabs + 1) * T

    def flat_nodes(arr):
        out = []
        for d in range(ndim):
            c = arr[..., d].astype(f32).reshape(node_dims[0], Rn_real)
            c = jnp.pad(c, [(0, rows_in - node_dims[0]), (0, Rn - Rn_real)])
            out.append(c)
        return out

    uh_flat = flat_nodes(u_hi)
    ul_flat = flat_nodes(u_lo)

    def flat_young(y):
        e = jnp.pad(
            y.astype(f32),
            [(0, rows_out - nx)] + [
                (0, nn - ne) for nn, ne in zip(rest_nodes, grid.dims[1:])
            ],
        ).reshape(rows_out, Rn_real)
        return jnp.pad(e, [(0, 0), (0, Rn - Rn_real)])

    yh = flat_young(young_hi)
    yl = flat_young(young_lo)

    kernel = functools.partial(
        _flat_df_kernel_body, ndim, npe, T, K0r, Rn, troffs, interpret
    )

    def wrapped(*refs):
        kernel(refs)

    def _imap(lead_shift):
        def imap(i):
            return (i + lead_shift, jnp.int32(0))
        return imap

    spec = pl.BlockSpec((T, Rn), _imap(0))
    next_spec = pl.BlockSpec((T, Rn), _imap(1))
    out_shape = [
        jax.ShapeDtypeStruct((rows_out, Rn), f32) for _ in range(2 * ndim)
    ]

    outs = pl.pallas_call(
        wrapped,
        out_shape=out_shape,
        grid=(nslabs,),
        in_specs=[spec] * (2 * ndim) + [next_spec] * (2 * ndim)
        + [spec, spec],
        out_specs=[spec] * (2 * ndim),
        scratch_shapes=[pltpu.VMEM((2 * ndim, Rn), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*uh_flat, *ul_flat, *uh_flat, *ul_flat, yh, yl)

    f64 = jnp.float64
    comps = [
        (outs[c][: node_dims[0], :Rn_real].astype(f64)
         + outs[ndim + c][: node_dims[0], :Rn_real].astype(f64))
        for c in range(ndim)
    ]
    return jnp.stack(comps, axis=-1).reshape(node_dims + (ndim,))


# Production dispatchers for the fine-level kernels. "flat" (the
# single-copy layout above) vs "variant" (the trailing-offset layout) is
# switchable per process for on-device A/B (NDR_FINE_KERNEL).
#
# Default "flat32": flat fp32 apply (measured 2.39 ms vs 3.91 variant at
# 256x128x128 on v5e, bit-validated vs XLA), variant two-float kernel —
# the flat df kernel's Mosaic compile ran past 5 min and exceeded the
# 100 MB VMEM budget at production Rn (the TwoSum temporaries double
# every live range), so it stays opt-in ("flat") until retiled.
import os as _os

# The flat df kernel exceeds the Mosaic compile + VMEM budget above this
# many flattened trailing lanes (observed at 256x128x128: Rn = 129*129 =
# 16641 → compile >5 min, VMEM >100 MB from the TwoSum temporaries'
# doubled live ranges) — requesting it at production sizes would hang
# exactly the A/B a user runs, so it falls back with a warning
# (ADVICE r3). The bound sits just below the observed-bad 16641; the
# 192-class Rn (97*97 = 9409) is the largest size the kernel has run at.
_FLAT_DF_MAX_RN = 16000


def _fine_impl():
    # read per call, not at import: A/B harnesses toggle NDR_FINE_KERNEL
    # programmatically after import (ADVICE r3). The jitted callers trace
    # through this at compile time; changing the env var only affects
    # later traces, which is exactly the A/B use case.
    return _os.environ.get("NDR_FINE_KERNEL", "flat32")


def apply_k_pallas_fine(u, young, K0, grid: Grid, **kw):
    if _fine_impl() in ("flat", "flat32"):
        return apply_k_pallas_flat(u, young, K0, grid, **kw)
    return apply_k_pallas(u, young, K0, grid, **kw)


def apply_k_pallas_df_fine(u_hi, u_lo, y_hi, y_lo, K0, grid: Grid, **kw):
    if _fine_impl() == "flat":
        rn = 1
        for n in grid.nodes_per_dim[1:]:
            rn *= n
        if rn <= _FLAT_DF_MAX_RN:
            return apply_k_pallas_df_flat(u_hi, u_lo, y_hi, y_lo, K0,
                                          grid, **kw)
        import warnings
        warnings.warn(
            f"NDR_FINE_KERNEL=flat: df kernel trailing size {rn} exceeds "
            f"the known-good Mosaic budget ({_FLAT_DF_MAX_RN}); using the "
            "variant-layout df kernel instead", stacklevel=2)
    return apply_k_pallas_df(u_hi, u_lo, y_hi, y_lo, K0, grid, **kw)


# ---------------------------------------------------------------------------
# Cached-Ke stiffness apply: Galerkin-coarsened multigrid levels.
#
# Coarse levels own a per-element stiffness Ke (dims..., d_pe, d_pe)
# instead of a SIMP modulus field. The XLA einsum path
# (operators.apply_k_cached) materializes the gathered-displacement and
# per-element-force intermediates and re-reads the Ke stack through an
# MXU-unfriendly batched 24x24 matvec — measured 7.6 ms at the
# 128x64x64 level-1 of a 256x128x128 solve, 5x over the Ke stack's own
# HBM traffic (1.2 GB fp32 -> 1.5 ms at v5e speed-of-light). This
# kernel streams the stack ONCE in a (d_pe^2, dims...) "plane per
# coefficient" layout and runs the contraction as 576 elementwise
# FMAs per slab over the same trailing-aligned variant layout as
# apply_k_pallas — DMA-bound on the Ke stack itself. bf16 Ke halves
# that traffic (the coarse operator only shapes the *preconditioner*,
# so Ke rounding costs CG iterations, not correctness — see
# MGSolverSettings.cached_ke_dtype).
#
# (reference: MultigridSolver.hh applyStiffnessMatrix on cached
# per-element stiffnesses, built by buildPESCoarse :604-669)
# ---------------------------------------------------------------------------

def _cached_kernel_body(ndim, npe, T, refs):
    """One x-slab of the cached-Ke apply.

    All trailing (element) dims arrive FLATTENED to one lane dimension R
    (a multiple of 128, enforced by the caller — so neither the Ke
    stream nor the displacement variants carry lane-padding waste in
    HBM). The u variants arrive pre-tiled as (nslabs+1, T, R) with
    (1, T, R) blocks and the outputs as (1, T+1, R) blocks — trailing
    block dims equal to the array dims, which Mosaic accepts for any
    slab thickness T (a 2-D (T, R) u block would demand T % 8 == 0,
    which the Ke-block VMEM budget rules out at production R). Variant
    geometry is identical to :func:`_kernel_body`; only the leading (x)
    dim is sliced in-kernel.
    """
    nv = 1 << (ndim - 1)
    n_in = nv * ndim
    uA = refs[:n_in]
    uB = refs[n_in: 2 * n_in]
    ke_ref = refs[2 * n_in]             # (T, d_pe^2, R)
    out_refs = refs[2 * n_in + 1:]      # (1, T + 1, R) each

    offs = list(itertools.product((0, 1), repeat=ndim))
    tvars = list(itertools.product((0, 1), repeat=ndim - 1))
    d_pe = npe * ndim

    u_slab = [
        jnp.concatenate([uA[i][0], uB[i][0][:1]], axis=0)
        for i in range(n_in)
    ]

    def view(b, d):
        o = offs[b]
        vi = tvars.index(tuple(o[1:]))
        return u_slab[vi * ndim + d][o[0]: o[0] + T]

    u_views = [[view(b, d) for d in range(ndim)] for b in range(npe)]

    for r in out_refs:
        r[...] = jnp.zeros_like(r)
    for a in range(npe):
        oa = offs[a]
        vi = tvars.index(tuple(oa[1:]))
        out_idx = (0, slice(oa[0], oa[0] + T))
        for c in range(ndim):
            row = a * ndim + c
            acc = None
            for b in range(npe):
                for d in range(ndim):
                    col = b * ndim + d
                    k = ke_ref[:, row * d_pe + col, :].astype(jnp.float32)
                    term = k * u_views[b][d]
                    acc = term if acc is None else acc + term
            ref = out_refs[vi * ndim + c]
            cur = ref[out_idx]
            ref[out_idx] = cur + acc


def ke_stream_layout(Ke: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    """Transpose a (dims..., d_pe, d_pe) per-element stiffness stack into
    the cached-apply streaming layout (nx, d_pe^2, R) with the trailing
    element dims flattened to R = prod(dims[1:])."""
    nd = grid.ndim
    d_pe = grid.nodes_per_elem * nd
    R = int(np.prod(grid.dims[1:]))
    ke = Ke.reshape((grid.dims[0], R, d_pe * d_pe))
    return jnp.swapaxes(ke, 1, 2)


def _pick_slab_for_vmem_cached(R, d2, dtype, requested: int) -> int:
    """Slab thickness bounded by the double-buffered Ke block footprint."""
    itemsize = jnp.dtype(dtype).itemsize
    budget = 55e6
    for T in (requested, 8, 4, 2, 1):
        if 2 * d2 * T * R * itemsize <= budget:
            return T
    return 1


def apply_k_pallas_cached(u: jnp.ndarray, ke_stream: jnp.ndarray,
                          grid: Grid, slab: int = 8,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused stiffness apply from a streamed per-element Ke stack.

    Drop-in equivalent of :func:`ndr_tpu.fem.operators.apply_k_cached`
    for degree-1 grids; ``ke_stream`` is the :func:`ke_stream_layout`
    transpose of the (dims..., d_pe, d_pe) stack (f32 or bf16). The
    apply is DMA-bound on the Ke stack itself (e.g. 1.2 GB fp32 at the
    128x64x64 level-1 of a 256x128x128 solve -> ~1.5 ms at v5e HBM
    speed-of-light, vs 7.6 ms measured for the XLA einsum path).
    """
    if grid.degree != 1:
        raise NotImplementedError("pallas applyK supports degree-1 elements")
    ndim = grid.ndim
    npe = grid.nodes_per_elem
    d_pe = npe * ndim
    d2 = d_pe * d_pe
    dt = u.dtype
    R = int(np.prod(grid.dims[1:]))
    if R % 128 and not interpret:
        # Mosaic needs lane-dim blocks in multiples of 128; callers
        # (build_level_states) only stream levels satisfying this
        raise NotImplementedError(
            f"cached-Ke stream needs prod(dims[1:]) % 128 == 0, got {R}")

    nx = grid.dims[0]
    T = _pick_slab_for_vmem_cached(R, d2, ke_stream.dtype, slab)
    pad = _pad_to_multiple(nx, T)
    if pad:
        grid = grid.with_dims((nx + pad,) + grid.dims[1:])
        u = jnp.pad(u, [(0, pad)] + [(0, 0)] * (u.ndim - 1))
        ke_stream = jnp.pad(ke_stream, [(0, pad), (0, 0), (0, 0)])

    nv = 1 << (ndim - 1)
    nslabs = grid.dims[0] // T

    u_vars = [c.reshape(c.shape[0], R) for c in _variant_slices(u, grid, ndim)]
    row_pad = (nslabs + 1) * T - (nx + pad + 1)
    # pre-tiled 3-D variants: Mosaic accepts (1, T, R) blocks for any T
    # (trailing dims equal the array's), unlike (T, R) blocks which
    # would need T % 8 == 0
    u_vars = [
        jnp.pad(c, [(0, row_pad), (0, 0)]).reshape(nslabs + 1, T, R)
        for c in u_vars
    ]

    out_shape = [
        jax.ShapeDtypeStruct((nslabs, T + 1, R), dt)
        for _ in range(nv * ndim)
    ]

    kernel = functools.partial(_cached_kernel_body, ndim, npe, T)

    def wrapped(*refs):
        kernel(refs)

    def _u_imap(lead_shift):
        def imap(i):
            return (i + lead_shift, jnp.int32(0), jnp.int32(0))
        return imap

    def _ke_imap(i):
        return (i, jnp.int32(0), jnp.int32(0))

    def _out_imap(i):
        return (i, jnp.int32(0), jnp.int32(0))

    slab_spec = pl.BlockSpec((1, T, R), _u_imap(0))
    next_spec = pl.BlockSpec((1, T, R), _u_imap(1))
    ke_spec = pl.BlockSpec((T, d2, R), _ke_imap)
    out_specs = [
        pl.BlockSpec((1, T + 1, R), _out_imap) for _ in range(nv * ndim)
    ]

    outs = pl.pallas_call(
        wrapped,
        out_shape=out_shape,
        grid=(nslabs,),
        in_specs=[slab_spec] * (nv * ndim) + [next_spec] * (nv * ndim)
        + [ke_spec],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*u_vars, *u_vars, ke_stream)

    # back to the (nslabs, T+1, rest...) shape _stitch_partials expects
    rest_elems = grid.dims[1:]
    outs = [o.reshape((nslabs, T + 1) + rest_elems) for o in outs]
    return _stitch_partials(outs, grid, nx, T)
