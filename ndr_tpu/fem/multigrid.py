"""Geometric multigrid preconditioned CG on the voxel grid (pure XLA).

TPU-native re-design of the reference's ``MultigridSolver``
(VoxelFEM/MultigridSolver.hh):

  * 2x coarsening hierarchy with Galerkin coarse element stiffnesses:
    the first (most expensive) level uses the 2^N cached coarsened-K0
    matrices so Ke_c is just a weighted sum of child Young moduli — an
    einsum that maps onto the MXU (reference: buildPESCoarse :604-669).
  * Dirichlet coarsening via the boundary-face rule, which for degree-1
    elements reduces to a stride-2 window max over the fine mask
    (reference: MultigridSolver.hh:43-84; derivation in the docstring of
    :func:`coarsen_dirichlet_mask`).
  * Multicolor Gauss-Seidel smoothing: for degree-1 elements the color
    classes are the 2^N node-parity classes; same-parity nodes never
    share an element, so each color updates in parallel
    (reference: visitNodesMulticolored :284-326, m_smoothNode :193-265
    with the Wu-2016 update and per-node triangular component solve).
  * V-cycle / full-multigrid cycles and the restructured PCG with
    force-residual stopping (reference: vcycle :516-553,
    fullMultigrid :486-508, preconditionedConjugateGradient :679-732).

Prolongation/restriction are separable per-axis [1/2, 1, 1/2] stencils
(the degree-1 specialization of the reference's shape-function transfer
operators, :99-180). Everything is static-shaped and jittable; the level
loop is unrolled at trace time.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ndr_tpu.fem import operators as ops
from ndr_tpu.fem import solvers
from ndr_tpu.fem.simulator import FEMProblem

# Solver-critical dots request true-f32 contraction EXPLICITLY rather than
# relying on the global default: without utils.jax_setup.setup(), f32
# einsums run 1-pass bf16 on TPU AND on this image's XLA:CPU (avx512bf16)
# — measured 1.2e-3 relative error in the Galerkin Ke, enough to make the
# coarsest K indefinite (NaN Cholesky) and corrupt CG dots.
_HIGHEST = jax.lax.Precision.HIGHEST
from ndr_tpu.grid import Grid


# ---------------------------------------------------------------------------
# Static hierarchy setup
# ---------------------------------------------------------------------------

def coarsen_dirichlet_mask(fine_mask: np.ndarray) -> np.ndarray:
    """Coarsen a nodal Dirichlet component mask by one 2x level (degree 1).

    Reference rule (MultigridSolver.hh:43-84): a fine Dirichlet node lying
    on the boundary vertex/edge/face of a coarse element constrains every
    coarse node of that element sharing the vertex/edge/face; interior
    fine nodes are an error. For degree-1 nested grids a fine node with
    index i lands at coarse-element reference coordinates in {0, 1/2, 1},
    and the constrained coarse nodes j are exactly those with
    |2 j - i|_inf <= 1 — i.e. a stride-2 window-3 max over the fine mask.
    A fine Dirichlet node with all-odd index would be interior; we raise,
    like the reference.
    """
    ndim = fine_mask.ndim - 1
    fine_nodes = fine_mask.shape[:-1]

    idx = np.where(fine_mask.any(axis=-1))
    if len(idx[0]):
        all_odd = np.ones(len(idx[0]), dtype=bool)
        for d in range(ndim):
            all_odd &= (idx[d] % 2) == 1
        if all_odd.any():
            raise ValueError(
                "Dirichlet constraints on internal nodes are not supported"
            )

    coarse_nodes = tuple((n - 1) // 2 + 1 for n in fine_nodes)
    out = np.zeros(coarse_nodes + fine_mask.shape[-1:], dtype=bool)
    # window |2j - i| <= 1 per dim: take max over fine index offsets {-1,0,1}
    padded = np.pad(
        fine_mask,
        [(1, 1)] * ndim + [(0, 0)],
        mode="constant",
        constant_values=False,
    )
    for off in itertools.product((0, 1, 2), repeat=ndim):
        sl = tuple(
            slice(off[d], off[d] + 2 * (coarse_nodes[d] - 1) + 1, 2)
            for d in range(ndim)
        )
        out |= padded[sl]
    return out


def compressed_interpolation_phis(ndim: int) -> np.ndarray:
    """phis[fi, fine_local_node, coarse_node] for degree-1 2x coarsening.

    Coarse shape functions evaluated at the nodes of each of the 2^N fine
    child elements (reference: getCompressedInterpolationOperator,
    MultigridSolver.hh:556-583). Child `fi` has per-dim offset bit
    ``(fi >> d) & 1``; local nodes are C-ordered multi-indices.
    """
    n_child = 1 << ndim
    local = np.array(list(itertools.product((0, 1), repeat=ndim)))  # C order
    phis = np.zeros((n_child, len(local), len(local)))
    for fi in range(n_child):
        off = np.array([(fi >> d) & 1 for d in range(ndim)])
        for i, a in enumerate(local):  # fine local node
            p = (a + off) / 2.0  # coarse reference coords
            for I, A in enumerate(local):  # coarse node
                w = 1.0
                for d in range(ndim):
                    w *= p[d] if A[d] == 1 else (1.0 - p[d])
                phis[fi, i, I] = w
    return phis


def coarsened_k0s(K0: np.ndarray, ndim: int) -> np.ndarray:
    """The 2^N matrices I_fi^T K0 I_fi (reference: MultigridSolver.hh:644-656)."""
    phis = compressed_interpolation_phis(ndim)
    npe = phis.shape[1]
    K0r = np.asarray(K0).reshape(npe, ndim, npe, ndim)
    out = np.einsum("icjd,fiI,fjJ->fIcJd", K0r, phis, phis)
    return out.reshape(phis.shape[0], npe * ndim, npe * ndim)


def deep_coarsened_k0s(K0: np.ndarray, ndim: int, level: int) -> np.ndarray:
    """C_l: level-l Galerkin contributions of each fine element position.

    A level-l coarse element contains (2^l)^N fine elements; the coarse
    Ke is  sum_r E[fine at r] * C_l[r]  with C_l[r] = P_r^T K0 P_r, where
    P_r interpolates the coarse trilinear basis at the fine element's
    nodes (the l-fold generalization of the reference's 2^N cached
    coarsened-K0 trick, MultigridSolver.hh:644-656).

    Returns ((2^l)^N, d, d) with r flattened in C order over the relative
    position tuple (matching :func:`pooled_young`).
    """
    npe = 1 << ndim
    d = npe * ndim
    K0r = np.asarray(K0).reshape(npe, ndim, npe, ndim)
    local = np.array(list(itertools.product((0, 1), repeat=ndim)))  # C order
    s = 1 << level
    out = np.zeros((s ** ndim, d, d))
    for ri, r in enumerate(itertools.product(range(s), repeat=ndim)):
        W = np.zeros((npe, npe))  # W[a, A]: coarse basis A at fine node a
        for a_i, a in enumerate(local):
            p = (np.asarray(r) + a) / s
            for A_i, A in enumerate(local):
                w = 1.0
                for dd in range(ndim):
                    w *= p[dd] if A[dd] == 1 else (1.0 - p[dd])
                W[a_i, A_i] = w
        C = np.einsum("acbe,aA,bB->AcBe", K0r, W, W)
        out[ri] = C.reshape(d, d)
    return out


def pooled_young(young: jnp.ndarray, level: int) -> jnp.ndarray:
    """Reshape the fine modulus field (dims...) to (coarse_dims..., R)
    where R = (2^l)^N gathers the fine elements of each level-l coarse
    element in C order over their relative position."""
    ndim = young.ndim
    s = 1 << level
    shape = []
    for n in young.shape:
        shape += [n // s, s]
    x = young.reshape(shape)
    # interleaved (c0, r0, c1, r1, ...) -> (c0, c1, ..., r0, r1, ...)
    perm = list(range(0, 2 * ndim, 2)) + list(range(1, 2 * ndim, 2))
    x = x.transpose(perm)
    coarse = tuple(n // s for n in young.shape)
    return x.reshape(coarse + (s ** ndim,))


@dataclasses.dataclass(frozen=True)
class MGLevel:
    """Static per-level data (grids, masks, parity color masks)."""

    grid: Grid
    dirichlet_mask: np.ndarray          # nodes + (N,) bool (numpy, static BCs)
    color_masks: np.ndarray             # (2^N,) + nodes bool


@dataclasses.dataclass(frozen=True)
class MGConfig:
    """Static multigrid configuration built once per (grid, BCs)."""

    levels: Tuple[MGLevel, ...]
    K0: np.ndarray                      # fine-level full-density Ke
    ck0: np.ndarray                     # (2^N, d, d) coarsened K0s (level 1)
    phis: np.ndarray                    # (2^N, npe, npe)
    # deep-coarsened K0 stacks per level (trace-time constants):
    # c_stacks[l]: ((2^l)^N, d, d); diag_stacks[l]: ((2^l)^N, npe, N, N)
    c_stacks: dict = dataclasses.field(default_factory=dict)
    diag_stacks: dict = dataclasses.field(default_factory=dict)
    # levels whose full Galerkin Ke exceeds this many bytes use the
    # transfer-based apply (R K_finer P) instead of materializing Ke
    ke_cache_limit_bytes: int = 1400 * 2**20
    # per-level guaranteed upper bounds on lambda_max(D^-1 K) (Chebyshev
    # smoother safety; see _pencil_lmax_bound). {level: float}
    lmax_bounds: dict = dataclasses.field(default_factory=dict)

    @property
    def num_levels(self) -> int:
        return len(self.levels)

    def c_stack(self, level: int) -> np.ndarray:
        return self.c_stacks[level]

    def diag_stack(self, level: int) -> np.ndarray:
        return self.diag_stacks[level]

    def ke_bytes(self, level: int) -> int:
        d = self.K0.shape[0]
        return self.levels[level].grid.num_elements * d * d * 4

    def level_kind(self, level: int) -> str:
        if level == 0:
            return "fine"
        # the coarsest level must cache Ke (direct dense factorization)
        if level == self.num_levels - 1:
            return "cached"
        return "cached" if self.ke_bytes(level) <= self.ke_cache_limit_bytes else "transfer"


def _parity_color_masks(grid: Grid) -> np.ndarray:
    """(degree+1)^N node-class masks in local-node C order (matching the
    color order of visitNodesMulticolored; reference:
    NDVector.hh visitSupportedNodes / MultigridSolver.hh:284-340).

    Two nodes share an element iff their multi-indices differ by < degree+1
    in every dim, so classes of coordinate mod (degree+1) are independent
    (degree 1: the usual 2^N parity classes)."""
    ndim = grid.ndim
    s = grid.degree + 1
    nodes = grid.nodes_per_dim
    masks = []
    for bits in itertools.product(range(s), repeat=ndim):  # C order over local idx
        m = np.ones(nodes, dtype=bool)
        for d in range(ndim):
            ax = np.arange(nodes[d]) % s == bits[d]
            shape = [1] * ndim
            shape[d] = nodes[d]
            m &= ax.reshape(shape)
        masks.append(m)
    return np.stack(masks)


def _pencil_lmax_bound(stack: np.ndarray, ndim: int) -> float:
    """Density-independent upper bound on lambda_max(D^-1 K) of an
    assembled level operator, from its per-element component matrices.

    K = sum_e A_e' S_e A_e with S_e = young_e * M_c (fine level: M_c = K0;
    Galerkin levels: the (2^l)^N coarsened-K0 components), and the
    block-Jacobi D assembles the same way from blockdiag(S_e). Hence for
    any x:  x'Kx = sum_e x_e' S_e x_e <= max_c lambda_max(bd(M_c)^-1 M_c)
    * sum_e x_e' bd(S_e) x_e = bound * x'Dx  — the young factors cancel,
    so the bound is a one-time numpy eigenproblem per component matrix.
    Unlike power iteration (which converges from *below* and, at
    multi-million-node grids, sits ~10% under the true lambda_max even
    after 100+ iterations), this can never under-estimate — an
    under-estimated Chebyshev interval amplifies the excluded top modes
    exponentially in the polynomial degree, which is what collapsed MGPCG
    at 192x96x96 (cg_iters pinned at the cap) while 64x32x16 ran fine.
    """
    M = np.asarray(stack, np.float64)
    if M.ndim == 2:
        M = M[None]
    d = M.shape[-1]
    npe = d // ndim
    D = np.zeros_like(M)
    for a in range(npe):
        s = slice(a * ndim, (a + 1) * ndim)
        D[:, s, s] = M[:, s, s]
    vals = np.linalg.eigvals(np.linalg.solve(D, M))
    return float(vals.real.max())


def build_mg_config(prob: FEMProblem, num_levels: int,
                    ke_cache_limit_bytes: int = 1400 * 2**20) -> MGConfig:
    """Build the static hierarchy for `num_levels` coarsenings.

    (reference: MultigridSolver constructor, MultigridSolver.hh:22-90)
    """
    if prob.grid.degree != 1 and num_levels > 0:
        # geometric 2x coarsening (interpolation stencils, Galerkin
        # component stacks, parity applies) is built for degree-1 node
        # lattices; higher degrees run un-coarsened (block-Jacobi PCG via
        # make_mg_solver's num_levels=0 fallback)
        raise NotImplementedError(
            "multigrid coarsening supports degree-1 elements; "
            "use num_levels=0 (block-Jacobi PCG) for higher degrees")
    levels = []
    grid = prob.grid
    mask = np.asarray(prob.dirichlet_mask)
    levels.append(MGLevel(grid, mask, _parity_color_masks(grid)))
    for _ in range(num_levels):
        grid = grid.coarsened()
        mask = coarsen_dirichlet_mask(mask)
        levels.append(MGLevel(grid, mask, _parity_color_masks(grid)))
    ndim = prob.grid.ndim
    K0 = np.asarray(prob.K0)
    npe = 1 << ndim
    c_stacks, diag_stacks = {}, {}
    for l in range(1, num_levels + 1):
        C = deep_coarsened_k0s(K0, ndim, l)
        diag_stacks[l] = np.einsum(
            "race->race",
            C.reshape(-1, npe, ndim, npe, ndim)[
                :, np.arange(npe), :, np.arange(npe), :
            ].transpose(1, 0, 2, 3),
        )
        c_stacks[l] = C
    lmax_bounds = {0: _pencil_lmax_bound(K0, ndim)}
    for l in range(1, num_levels + 1):
        lmax_bounds[l] = _pencil_lmax_bound(c_stacks[l], ndim)
    deg1 = prob.grid.degree == 1
    return MGConfig(
        levels=tuple(levels),
        K0=K0,
        # interpolation/Galerkin constants are degree-1 constructions;
        # higher-degree configs exist only at num_levels=0 (never coarsen)
        ck0=coarsened_k0s(K0, ndim) if deg1 else None,
        phis=compressed_interpolation_phis(ndim) if deg1 else None,
        c_stacks=c_stacks,
        diag_stacks=diag_stacks,
        ke_cache_limit_bytes=ke_cache_limit_bytes,
        lmax_bounds=lmax_bounds,
    )


# ---------------------------------------------------------------------------
# Galerkin coarse stiffness (traced; recomputed whenever densities change)
# ---------------------------------------------------------------------------

def _child_slices(ndim: int, fi: int) -> Tuple[slice, ...]:
    return tuple(slice((fi >> d) & 1, None, 2) for d in range(ndim))


def build_level_stiffness(
    cfg: MGConfig, young: jnp.ndarray
) -> List[jnp.ndarray]:
    """Per-element stiffness matrices for levels 1..L from the fine Young
    field (reference: updateElementStiffnessMatrices + buildPESCoarse).

    Returns list `Ke[l]` for l = 1..L with shapes (dims_l..., d, d).
    """
    ndim = cfg.levels[0].grid.ndim
    out = []
    for l in range(1, cfg.num_levels):
        out.append(build_level_ke(cfg, young, l))
    return out


def _child_w_stack(ndim: int) -> np.ndarray:
    """(2^N, npe, npe) child interpolation weights W[r, a, A] = coarse
    trilinear basis A evaluated at fine node a of the child cell at
    relative position r — r in C order over the position tuple (the
    :func:`pooled_young` grouping convention)."""
    local = np.array(list(itertools.product((0, 1), repeat=ndim)))
    rs = list(itertools.product((0, 1), repeat=ndim))
    out = np.zeros((len(rs), len(local), len(local)))
    for ri, r in enumerate(rs):
        for a_i, a in enumerate(local):
            p = (np.asarray(r) + a) / 2.0
            for A_i, A in enumerate(local):
                w = 1.0
                for d in range(ndim):
                    w *= p[d] if A[d] == 1 else (1.0 - p[d])
                out[ri, a_i, A_i] = w
    return out


def coarsen_ke(Ke_prev: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """One-level Galerkin coarsening of per-element stiffness matrices:
    Ke_l[e] = sum_r W_r^T Ke_{l-1}[2e+r] W_r.

    Exactly equals the direct deep-coarsened construction (trilinear
    spaces are nested, so P_{0->l} = P_{0->l-1} P_{l-1->l}), but its
    trace-time constant is the fixed (2^N, npe, npe) child stack instead
    of the ((2^l)^N, d, d) deep stack — 75 MB at level 5 of a 256-class
    grid — and the per-element contraction is 2^N small matmuls instead
    of a (2^l)^N-term weighted sum."""
    npe = 1 << ndim
    d = npe * ndim
    dims_prev = Ke_prev.shape[:-2]
    # group 2x2(x2) children like pooled_young (s=2, C order)
    shape = []
    for n in dims_prev:
        shape += [n // 2, 2]
    x = Ke_prev.reshape(shape + [d, d])
    perm = (list(range(0, 2 * ndim, 2)) + list(range(1, 2 * ndim, 2))
            + [2 * ndim, 2 * ndim + 1])
    x = x.transpose(perm)
    coarse = tuple(n // 2 for n in dims_prev)
    x = x.reshape(coarse + (npe, npe, ndim, npe, ndim))  # (..., r, a,c,b,e)
    W = jnp.asarray(_child_w_stack(ndim), Ke_prev.dtype)
    out = jnp.einsum(
        "...racbe,raA,rbB->...AcBe", x, W, W,
        preferred_element_type=Ke_prev.dtype, precision=_HIGHEST,
    )
    return out.reshape(coarse + (d, d))


def build_level_ke(cfg: MGConfig, young: jnp.ndarray, level: int) -> jnp.ndarray:
    """Level-l Galerkin element stiffnesses *directly* from the fine
    modulus field: one MXU matmul (ne_l, R) @ (R, d*d) with the
    trace-time-constant deep-coarsened K0 stack."""
    ndim = cfg.levels[0].grid.ndim
    d = cfg.K0.shape[0]
    C = jnp.asarray(cfg.c_stack(level), dtype=young.dtype)  # (R, d, d)
    pooled = pooled_young(young, level)                     # (dims_l..., R)
    Ke = jnp.einsum(
        "...r,rde->...de", pooled, C,
        preferred_element_type=young.dtype, precision=_HIGHEST,
    )
    return Ke


def build_level_ke_diag(cfg: MGConfig, young: jnp.ndarray, level: int):
    """Only the per-element (local-node) diagonal blocks of the level-l
    Ke — enough for smoother diagonals on levels whose full Ke would not
    fit comfortably in HBM. Shape (dims_l..., npe, N, N)."""
    ndim = cfg.levels[0].grid.ndim
    npe = 1 << ndim
    diagC = jnp.asarray(cfg.diag_stack(level), dtype=young.dtype)  # (R, npe, N, N)
    pooled = pooled_young(young, level)
    return jnp.einsum(
        "...r,race->...ace", pooled, diagC,
        preferred_element_type=young.dtype, precision=_HIGHEST,
    )


# ---------------------------------------------------------------------------
# Transfer operators (degree-1 separable [1/2, 1, 1/2] stencils)
# ---------------------------------------------------------------------------

def _prolong_axis(u: jnp.ndarray, axis: int) -> jnp.ndarray:
    n = u.shape[axis]
    out_shape = list(u.shape)
    out_shape[axis] = 2 * n - 1
    out = jnp.zeros(out_shape, dtype=u.dtype)
    even = tuple(
        slice(0, None, 2) if a == axis else slice(None) for a in range(u.ndim)
    )
    odd = tuple(
        slice(1, None, 2) if a == axis else slice(None) for a in range(u.ndim)
    )
    lo = tuple(
        slice(0, n - 1) if a == axis else slice(None) for a in range(u.ndim)
    )
    hi = tuple(slice(1, n) if a == axis else slice(None) for a in range(u.ndim))
    out = out.at[even].set(u)
    out = out.at[odd].set(0.5 * (u[lo] + u[hi]))
    return out


def _restrict_axis(r: jnp.ndarray, axis: int) -> jnp.ndarray:
    even = r[tuple(slice(0, None, 2) if a == axis else slice(None) for a in range(r.ndim))]
    odd = r[tuple(slice(1, None, 2) if a == axis else slice(None) for a in range(r.ndim))]
    pad_lo = [(0, 0)] * r.ndim
    pad_lo[axis] = (1, 0)
    pad_hi = [(0, 0)] * r.ndim
    pad_hi[axis] = (0, 1)
    return even + 0.5 * (jnp.pad(odd, pad_lo) + jnp.pad(odd, pad_hi))


def prolongate(u_coarse: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Interpolate a coarse node field to the fine grid (I u_c).

    (reference: MultigridSolver.hh:115-141 interpolation/accum_interpolation)
    """
    out = u_coarse
    for axis in range(ndim):
        out = _prolong_axis(out, axis)
    return out


def restrict(r_fine: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Apply the transposed interpolation operator (I^T r_f).

    (reference: MultigridSolver.hh:146-180 restriction)
    """
    out = r_fine
    for axis in range(ndim):
        out = _restrict_axis(out, axis)
    return out


# ---------------------------------------------------------------------------
# Per-solve level state
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class LevelState:
    """Traced per-level operators for one density configuration.

    kind:
      * "fine"     — matrix-free apply from the SIMP modulus field;
      * "cached"   — per-element Galerkin Ke materialized (small levels);
      * "transfer" — Ke would be too large for HBM (e.g. level 1 of a
        256^3-class grid is ~1.2 GB): apply as R K_parent P, which is
        exactly the Galerkin operator at ~the cost of one finer-level
        apply. (The reference faces the same choice between matrix-free
        and blockK applies — TensorProductSimulator.hh applyK vs
        applyBlockK and MultigridSolver.hh buildBlockStiffnessMatrices —
        with CPU cache economics instead of HBM economics.)
    """

    grid: Grid
    dirichlet_mask: jnp.ndarray
    color_masks: jnp.ndarray
    young: Optional[jnp.ndarray]        # level 0 only
    Ke: Optional[jnp.ndarray]           # "cached" levels
    Minv_rows: jnp.ndarray              # nodes + (N, N) diag blocks of K
    K0: Optional[jnp.ndarray]           # level 0 only
    Dinv: Optional[jnp.ndarray] = None  # inverse diag blocks (chebyshev)
    lmax: Optional[jnp.ndarray] = None  # est. top eigenvalue of Dinv K
    use_pallas: bool = False            # fused Pallas applyK (level 0)
    kind: str = "cached"
    parent: Optional["LevelState"] = None  # finer level ("transfer" only)
    # streamed (d_pe^2, dims...) Ke layout for the fused cached-Ke Pallas
    # apply (chebyshev production path; see pallas_kernels); when set it
    # REPLACES Ke on intermediate levels to avoid storing the stack twice
    Ke_stream: Optional[jnp.ndarray] = None


def _apply_k_level(lv: LevelState, u: jnp.ndarray) -> jnp.ndarray:
    if lv.kind == "fine":
        if lv.use_pallas:
            from ndr_tpu.fem import pallas_kernels as pk
            return pk.apply_k_pallas_fine(u, lv.young, lv.K0, lv.grid)
        return ops.apply_k(u, lv.young, lv.K0, lv.grid)
    if lv.kind == "transfer":
        ndim = lv.grid.ndim
        return restrict(_apply_k_level(lv.parent, prolongate(u, ndim)), ndim)
    if lv.Ke_stream is not None:
        from ndr_tpu.fem import pallas_kernels as pk
        return pk.apply_k_pallas_cached(u, lv.Ke_stream, lv.grid)
    return ops.apply_k_cached(u, lv.Ke, lv.grid)


def _zero_dirichlet(lv: LevelState, u: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(lv.dirichlet_mask, 0.0, u)


def _gs_trisolve_color(lv: LevelState, r, color_idx: int, forward: bool):
    """du = mask_color * trisolve(M, r).

    Per-node component update follows the reference's in-node triangular
    sweep: forward uses (L + D), backward uses (D + U) of the NxN diagonal
    block M, skipping Dirichlet-fixed components
    (reference: MultigridSolver.hh:252-264).
    """
    ndim = lv.grid.ndim
    M = lv.Minv_rows  # the raw diag blocks (nodes..., N, N)
    free = 1.0 - lv.dirichlet_mask.astype(r.dtype)

    comps = range(ndim) if forward else range(ndim - 1, -1, -1)
    ud = [None] * ndim
    for i in comps:
        acc = r[..., i]
        for j in range(ndim):
            if ud[j] is not None:
                acc = acc - M[..., i, j] * ud[j]
        ud[i] = free[..., i] * acc / M[..., i, i]
    ud = jnp.stack(ud, axis=-1)
    mask = lv.color_masks[color_idx][..., None].astype(r.dtype)
    return mask * ud


def apply_k_parity(lv: LevelState, du, parity) -> jnp.ndarray:
    """K du for a `du` supported on ONE node-parity class — at 1/2^N the
    cost of a full apply.

    Every degree-1 element has exactly one local node of a given global
    parity (its index determined by the element's own parity), so the
    element contraction collapses from (dofs_pe x dofs_pe) to
    (dofs_pe x N): group the elements by their parity q (stride-2
    slices), gather the single active corner from the parity-p
    sub-lattice of du, contract with the constant K0 column block (fine
    level) or the cached Ke column block, and scatter the 2^N outputs
    back through stride-2 slice adds. This is what makes the incremental
    multicolor GS sweep cost ~one apply total instead of 2^N applies
    (reference smoother: MultigridSolver.hh:284-340)."""
    grid = lv.grid
    ndim = grid.ndim
    npe = grid.nodes_per_elem
    dims = grid.dims
    offs = ops.local_node_offsets(grid)
    dt = du.dtype

    du_p = du[tuple(slice(p, None, 2) for p in parity)]
    out = jnp.zeros_like(du)
    if lv.kind == "fine":
        K0r = np.asarray(lv.K0, np.float64).reshape(npe, ndim, npe, ndim)
    for q in itertools.product((0, 1), repeat=ndim):
        esl = tuple(slice(qd, None, 2) for qd in q)
        nq = tuple(len(range(q[d], dims[d], 2)) for d in range(ndim))
        if 0 in nq:
            continue
        o = tuple((parity[d] - q[d]) % 2 for d in range(ndim))
        a_star = int(np.flatnonzero((offs == np.asarray(o)).all(axis=1))[0])
        s_in = tuple((q[d] + o[d] - parity[d]) // 2 for d in range(ndim))
        dc = du_p[tuple(slice(s_in[d], s_in[d] + nq[d])
                        for d in range(ndim))]          # (nq..., N)
        if lv.kind == "fine":
            block = jnp.asarray(K0r[:, :, a_star, :], dt)    # (npe, N, N)
            Eq = lv.young[esl]
            fe = Eq[..., None, None] * jnp.einsum(
                "acd,...d->...ac", block, dc,
                preferred_element_type=dt, precision=_HIGHEST)
        else:
            Keq = lv.Ke[esl].reshape(nq + (npe, ndim, npe, ndim))
            fe = jnp.einsum(
                "...acd,...d->...ac", Keq[..., :, :, a_star, :].astype(dt),
                dc, preferred_element_type=dt, precision=_HIGHEST)
        for a in range(npe):
            off = offs[a]
            start = tuple(int(q[d] + off[d]) for d in range(ndim))
            tsl = tuple(
                slice(start[d], start[d] + 2 * nq[d] - 1, 2)
                for d in range(ndim)
            )
            out = out.at[tsl].add(fe[..., a, :])
    return out


def gs_sweep(lv: LevelState, u, b, forward: bool = True):
    """One multicolor Gauss-Seidel sweep over all 2^N parity colors.

    The residual is carried across colors and updated incrementally:
    r <- r - K du with du supported on the just-updated parity class,
    which :func:`apply_k_parity` evaluates at 1/2^N of a full apply —
    so the whole sweep costs ~2 full-apply equivalents instead of 2^N
    full applies. Levels without parity structure in their operator
    ("transfer" applies) fall back to the full apply per color.
    (reference: smoothingMulticoloredGS, MultigridSolver.hh:336-340)
    """
    n_colors = lv.color_masks.shape[0]
    bits = list(itertools.product((0, 1), repeat=lv.grid.ndim))
    order = list(range(n_colors)) if forward else list(
        range(n_colors - 1, -1, -1))

    # the 1/2^N-cost parity apply is a degree-1 construction; transfer
    # levels and higher-degree grids update with the full apply per color
    parity_ok = lv.kind != "transfer" and lv.grid.degree == 1
    r = b - _apply_k_level(lv, u)
    for k, c in enumerate(order):
        du = _gs_trisolve_color(lv, r, c, forward)
        u = u + du
        if k == n_colors - 1:
            break
        if parity_ok:
            r = r - apply_k_parity(lv, du, bits[c])
        else:
            r = r - _apply_k_level(lv, du)
    return u


def build_level_states(
    cfg: MGConfig, prob: FEMProblem, young: jnp.ndarray,
    smoother: str = "gs", power_iters: int = 8, use_pallas: bool = False,
    cached_ke_dtype: Optional[str] = None,
    masks: Optional[Sequence[jnp.ndarray]] = None,
) -> List[LevelState]:
    # the fused Pallas kernel is fp32-only (TPUs have no native f64) and
    # degree-1-only; float64 / higher-degree problems take the XLA apply
    use_pallas = (use_pallas and young.dtype == jnp.float32
                  and cfg.levels[0].grid.degree == 1)
    states = []
    last = cfg.num_levels - 1
    # full-precision Ke of the previous cached level, kept for recursive
    # Galerkin even when LevelState stores a cached_ke_dtype downcast
    # (coarsening a downcast Ke would compound the rounding level-over-
    # level through the rigid-body null space — see MGSolverSettings)
    prev_full_ke = None
    for l, lev in enumerate(cfg.levels):
        kind = cfg.level_kind(l)
        Ke = None
        Ke_stream = None
        if l == 0:
            M = ops.node_diag_blocks(young, cfg.K0, lev.grid)
        else:
            if kind == "cached":
                if prev_full_ke is not None and l >= 2:
                    # recursive Galerkin from the finer cached level:
                    # avoids the deep c_stack constants (see coarsen_ke)
                    Ke = coarsen_ke(
                        prev_full_ke.astype(young.dtype), lev.grid.ndim
                    )
                else:
                    Ke = build_level_ke(cfg, young, l)
                M = ops.node_diag_blocks_cached(Ke, lev.grid)
                prev_full_ke = Ke
                if (
                    use_pallas
                    and smoother == "chebyshev"
                    and l != last
                    and lev.grid.ndim == 3
                    and lev.grid.num_elements >= (1 << 13)
                    # lane-dim constraint of the streamed kernel
                    and int(np.prod(lev.grid.dims[1:])) % 128 == 0
                ):
                    # stream layout for the fused cached-Ke Pallas apply
                    # (the GS path keeps the (dims, d, d) stack: its
                    # parity apply slices element dims directly)
                    from ndr_tpu.fem import pallas_kernels as pk
                    Ke_stream = pk.ke_stream_layout(Ke, lev.grid)
                    if cached_ke_dtype:
                        Ke_stream = Ke_stream.astype(cached_ke_dtype)
                    Ke = None
                elif (
                    cached_ke_dtype
                    and l != last
                    and young.dtype == jnp.float32
                ):
                    Ke = Ke.astype(cached_ke_dtype)
            else:
                ke_diag = build_level_ke_diag(cfg, young, l)
                M = ops.node_diag_blocks_from_elem_diag(ke_diag, lev.grid)
                # recursion only valid from the immediately-finer level
                prev_full_ke = None
        states.append(
            LevelState(
                grid=lev.grid,
                # per-level Dirichlet masks: jit operands when the caller
                # hoists them (`masks`), else inlined constants. The GS
                # color masks (2^N full-size bools per level) stay numpy
                # unless the GS smoother actually consumes them — for
                # Chebyshev they would otherwise bloat every traced
                # module as dead ~4-33 MB literals.
                dirichlet_mask=(jnp.asarray(lev.dirichlet_mask)
                                if masks is None else masks[l]),
                color_masks=(jnp.asarray(lev.color_masks)
                             if smoother == "gs" else lev.color_masks),
                young=young if l == 0 else None,
                Ke=Ke,
                Minv_rows=M,
                # keep K0 CONCRETE (numpy): the Pallas kernel unrolls its
                # entries into scalar coefficients at trace time, which a
                # traced array (e.g. under the neural path's grad) breaks
                K0=np.asarray(cfg.K0, dtype=young.dtype) if l == 0 else None,
                use_pallas=use_pallas and l == 0,
                kind=kind,
                parent=states[-1] if l > 0 else None,
                Ke_stream=Ke_stream,
            )
        )
    if smoother == "chebyshev":
        for l, lv in enumerate(states):
            lv.Dinv = ops.invert_blocks(lv.Minv_rows)
            # lambda_max for the Chebyshev interval: the guaranteed
            # elementwise pencil bound, tightened by an inflated power
            # estimate where the bound is loose (deep Galerkin levels).
            # The bound is exact-at-high-contrast on the fine level; the
            # 1.2x inflation absorbs power iteration's slow from-below
            # convergence on multi-million-node grids (see
            # _pencil_lmax_bound). power_iters=0 uses the bound alone —
            # a trace-time constant: no stiffness applies at hierarchy
            # build, fewer traced apply instances (compile time).
            bound = cfg.lmax_bounds.get(l)
            if power_iters <= 0 and bound is not None:
                lv.lmax = jnp.asarray(bound, lv.Minv_rows.dtype)
                continue
            est = (1.2 / 1.05) * _estimate_lmax(lv, max(power_iters, 1))
            lv.lmax = est if bound is None else jnp.minimum(
                jnp.asarray(bound, est.dtype), est)
    return states


def _dinv_apply(lv: LevelState, r):
    z = jnp.einsum("...ij,...j->...i", lv.Dinv, r, precision=_HIGHEST)
    return _zero_dirichlet(lv, z)


def _estimate_lmax(lv: LevelState, iters: int) -> jnp.ndarray:
    """Power iteration estimate of lambda_max(D^-1 K) on the free DOFs.

    Runs at hierarchy-build time (once per density update); a 1.05 safety
    factor guards the Chebyshev interval.
    """
    # deterministic pseudo-random start (key fixed: estimate only needs to
    # be non-orthogonal to the top eigenvector)
    v = _zero_dirichlet(
        lv, jax.random.normal(jax.random.PRNGKey(7),
                              lv.grid.nodes_per_dim + (lv.grid.ndim,),
                              lv.Minv_rows.dtype)
    )

    def body(_, carry):
        v, lam = carry
        w = _dinv_apply(lv, _zero_dirichlet(lv, _apply_k_level(lv, v)))
        lam = jnp.sqrt(jnp.vdot(w, w) / jnp.maximum(jnp.vdot(v, v), 1e-30))
        return w / jnp.maximum(jnp.linalg.norm(w.reshape(-1)), 1e-30), lam

    _, lam = jax.lax.fori_loop(
        0, iters, body, (v, jnp.asarray(1.0, lv.Minv_rows.dtype))
    )
    return 1.05 * lam


def chebyshev_core(apply_fn, dinv_fn, zero_fn, lmax, x, b, degree: int,
                   lower_frac: float = 0.25, x_is_zero: bool = False,
                   need_r: bool = False, r0=None):
    """Degree-`degree` Chebyshev polynomial smoothing on D^-1 K, written
    against abstract (apply, D^-1, Dirichlet-zero) operators so the
    single-chip and shard_map paths share the exact same polynomial.

    Returns ``(x, r)``. The smoother maintains the residual
    incrementally anyway, so callers that need ``b - K x`` next (the
    V-cycle's restriction right after pre-smoothing) get it FOR FREE —
    one whole stiffness apply saved per level. Symmetrically, when
    ``need_r=False`` the final iteration skips its residual update and
    D^-1 apply (nobody consumes them; ``r`` is returned as ``None``):
    the post-smoother saves another apply. Together: 2D+2 -> 2D fine
    applies per V-cycle level at total degree D.

    ``r0`` (optional) is a precomputed ``zero_fn(b - K x)`` for the
    incoming ``x``, skipping the initial apply (shard_map path chains
    smoothing iterations this way).
    """
    lmin = lower_frac * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta

    # skip the initial stiffness apply when x == 0 (every correction
    # V-cycle starts from a zero guess)
    if r0 is not None:
        r = r0
    else:
        r = b if x_is_zero else zero_fn(b - apply_fn(x))
    z = dinv_fn(r)
    d = z / theta
    rho = 1.0 / sigma1

    # fori_loop keeps ONE stiffness-apply instance in the traced graph
    # regardless of the polynomial degree (trace/compile time at large
    # grids is dominated by repeated applyK subgraphs)
    def body(_, carry):
        x, r, d, rho = carry
        x = x + d
        r = zero_fn(r - apply_fn(d))
        z = dinv_fn(r)
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * z
        return x, r, d, rho_new

    x, r, d, rho = jax.lax.fori_loop(
        0, degree - 1, body, (x, r, d, rho * jnp.ones_like(lmax))
    )
    # final iteration: only the x update is unconditionally needed
    x = x + d
    if not need_r:
        return x, None
    return x, zero_fn(r - apply_fn(d))


def chebyshev_smooth(lv: LevelState, x, b, degree: int,
                     lower_frac: float = 0.25, x_is_zero: bool = False,
                     need_r: bool = False):
    """Chebyshev smoothing on a LevelState; returns ``(x, r)`` where
    ``r = b - K x`` is free when requested (see :func:`chebyshev_core`).

    TPU-first replacement for multicolor Gauss-Seidel: one stiffness
    apply per degree, no sequential color passes, and (being a fixed
    polynomial in an SPD-preconditioned operator) symmetric — safe inside
    PCG. Targets the upper spectrum [lower_frac*lmax, lmax], the classic
    choice for 2x-coarsening multigrid smoothers. This is a deliberate,
    documented deviation from the reference's GS smoother
    (MultigridSolver.hh:193-340); parity of the overall MGPCG is argued
    via the accuracy/iteration-count envelope (SURVEY.md §4.5), and the
    GS smoother remains available (smoother='gs').
    """
    return chebyshev_core(
        lambda v: _apply_k_level(lv, v),
        lambda r: _dinv_apply(lv, r),
        lambda v: _zero_dirichlet(lv, v),
        lv.lmax, x, b, degree, lower_frac=lower_frac, x_is_zero=x_is_zero,
        need_r=need_r,
    )


# ---------------------------------------------------------------------------
# Cycles
# ---------------------------------------------------------------------------

def _coarse_solve(lv: LevelState, coarse, b):
    """Coarsest-level solve: dense Cholesky or precomputed NS inverse.

    (reference: vcycle coarsest-level CHOLMOD solve, MultigridSolver.hh:521-523)
    """
    kind, data = coarse
    mask = lv.dirichlet_mask.reshape(-1)
    rhs = jnp.where(mask, 0.0, b.reshape(-1))
    if kind == "ns":
        x = jnp.matmul(data, rhs, precision=_HIGHEST)
    else:
        x = jax.scipy.linalg.cho_solve(data, rhs)
    return x.reshape(b.shape)


def _coarsest_dense_k(levels: List[LevelState]):
    lv = levels[-1]
    K = solvers.assemble_dense_k_traced(lv.Ke, lv.grid)
    mask = lv.dirichlet_mask.reshape(-1)
    K = jnp.where(mask[:, None] | mask[None, :], 0.0, K)
    K = K + jnp.diag(mask.astype(K.dtype))
    # Tikhonov guard: with few Dirichlet pins (e.g. MBB's single corner
    # support) the Galerkin-coarsened K can be indefinite at fp32 machine
    # precision (observed min eig ~ -2e-6 on an 18x6 coarse grid), which
    # makes the Cholesky NaN and poisons the whole MGPCG. The coarse solve
    # only preconditions, so a *relative* diagonal shift is harmless to
    # convergence while making the factorization unconditionally PD.
    # The shift must sit decisively above the fp32 Galerkin rounding floor:
    # recursive coarsening amplifies Ke rounding through the rigid-body
    # null space to ~1e-5 of the diagonal, and a 1e-5 shift proved exactly
    # marginal — whether cho_factor hit a negative pivot flipped with the
    # (uniform!) density scale's rounding realization (NaN at rho=0.2864,
    # fine at 0.28, on a 60x20 MBB with mgl=2).
    eps = 1e-4 if K.dtype == jnp.float32 else 1e-12
    return K + jnp.diag(eps * jnp.diagonal(K))


def factor_coarsest(levels: List[LevelState], method: str = "cholesky"):
    """Prepare the coarsest-level solve operator.

    method="cholesky": dense cho_factor (exact; the float64 parity path).
    method="ns": Jacobi-scaled Newton–Schulz inverse — matmul-only, so it
    runs on the MXU instead of the serial-structure-bound triangular
    factorization path (measured ~70-80 ms for a 675-dof cho_factor on
    v5e vs ~1-2 ms of 675^3 matmuls). X_k is a polynomial in the scaled K,
    hence symmetric PD: the MG preconditioner stays SPD and PCG-safe.
    Jacobi pre-scaling D^-1/2 K D^-1/2 removes the SIMP modulus contrast
    from the spectrum, keeping the fp32 Newton-Schulz residual floor
    (~kappa_hat * eps) far below preconditioner-quality requirements.
    """
    K = _coarsest_dense_k(levels)
    if method == "cholesky":
        return ("chol", jax.scipy.linalg.cho_factor(K, lower=True))
    assert method == "ns", method
    return ("ns", ns_inverse(K))


def ns_inverse(K: jnp.ndarray, iters: int = 30) -> jnp.ndarray:
    """Jacobi-scaled Newton-Schulz inverse of a dense SPD matrix.

    Matmul-only (MXU-bound, no serial triangular structure); the result
    is a polynomial in the scaled K congruence-transformed back, hence
    symmetric PD. Used as the coarsest-level solve of the fp32 MG
    preconditioner. K must have a strictly positive diagonal (the masked
    + Tikhonov-shifted coarsest K satisfies this by construction).
    """
    d = jnp.diagonal(K)
    s = jax.lax.rsqrt(d)
    Khat = (K * s[:, None]) * s[None, :]
    n = K.shape[0]
    eye = jnp.eye(n, dtype=K.dtype)
    # X0 = I/||Khat||_1: for symmetric K, ||K||_2 <= ||K||_1, so the
    # spectrum of I - Khat X0 lies in [0, 1) and X_{k+1} = X_k(2I - Khat X_k)
    # converges monotonically (residual squares each iteration).
    norm1 = jnp.max(jnp.sum(jnp.abs(Khat), axis=1))
    X0 = eye * (1.0 / norm1)

    def body(_, X):
        KX = jnp.matmul(Khat, X, precision=_HIGHEST)
        return jnp.matmul(X, 2.0 * eye - KX, precision=_HIGHEST)

    # `iters` doublings cover a Jacobi-scaled condition number up to ~1e7
    # (2^30 >= kappa_hat * ln(1/eps)); extra iterations past convergence
    # are harmless (X is a fixed point) and the matmuls are trivial.
    X = jax.lax.fori_loop(0, iters, body, X0)
    return (s[:, None] * X) * s[None, :]


def _smooth(lv: LevelState, x, b, nsmooth: int, forward: bool,
            smoother: str, cheb_degree: int, x_is_zero: bool = False,
            need_r: bool = False):
    """Returns ``(x, r)``; ``r`` is ``b - K x`` when the smoother yields
    it for free (Chebyshev with ``need_r``), else ``None``."""
    if smoother == "chebyshev":
        # degree plays the role of "sweeps"; direction is irrelevant
        return chebyshev_smooth(lv, x, b, degree=cheb_degree * nsmooth,
                                x_is_zero=x_is_zero, need_r=need_r)
    for _ in range(nsmooth):
        x = gs_sweep(lv, x, b, forward=forward)
    return x, None


def vcycle(levels, chol, l, x, b, nsmooth: int, symmetric_gs: bool = True,
           smoother: str = "gs", cheb_degree: int = 2, x_zero: bool = False):
    """(reference: MultigridSolver.hh:516-553)"""
    if l == len(levels) - 1:
        return _coarse_solve(levels[l], chol, b)
    lv = levels[l]
    x = x if x_zero else _zero_dirichlet(lv, x)
    x, r = _smooth(lv, x, b, nsmooth, True, smoother, cheb_degree,
                   x_is_zero=x_zero, need_r=True)
    if r is None:  # GS path: explicit residual
        r = _zero_dirichlet(lv, b - _apply_k_level(lv, x))
    b_c = restrict(r, lv.grid.ndim)
    x_c = vcycle(levels, chol, l + 1, jnp.zeros_like(b_c), b_c, nsmooth,
                 symmetric_gs, smoother, cheb_degree, x_zero=True)
    x = x + prolongate(x_c, lv.grid.ndim)
    x, _ = _smooth(lv, x, b, nsmooth, not symmetric_gs, smoother,
                   cheb_degree)
    return x


def full_multigrid(levels, chol, l, b, nsmooth: int, symmetric_gs: bool = True,
                   smoother: str = "gs", cheb_degree: int = 2):
    """(reference: MultigridSolver.hh:486-508)"""
    if l == len(levels) - 1:
        return _coarse_solve(levels[l], chol, b)
    b_c = restrict(b, levels[l].grid.ndim)
    x_c = full_multigrid(levels, chol, l + 1, b_c, nsmooth, symmetric_gs,
                         smoother, cheb_degree)
    x = prolongate(x_c, levels[l].grid.ndim)
    return vcycle(levels, chol, l, x, b, nsmooth, symmetric_gs, smoother,
                  cheb_degree)


def mg_preconditioner(levels, chol, r, mg_iterations: int, nsmooth: int,
                      fmg: bool, smoother: str = "gs", cheb_degree: int = 2):
    """s ~= K^-1 r (reference: applyPreconditionerInv, MultigridSolver.hh:476-481)."""
    if fmg:
        s = full_multigrid(levels, chol, 0, r, nsmooth, True, smoother, cheb_degree)
        for _ in range(mg_iterations - 1):
            s = vcycle(levels, chol, 0, s, r, nsmooth, True, smoother, cheb_degree)
    else:
        s = jnp.zeros_like(r)
        for k in range(mg_iterations):
            s = vcycle(levels, chol, 0, s, r, nsmooth, True, smoother,
                       cheb_degree, x_zero=(k == 0))
    return s


# ---------------------------------------------------------------------------
# MGPCG driver
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MGSolverSettings:
    """(reference: MultigridComplianceObjective knobs,
    TopologyOptimizationObjective.hh:96-101 + fem.py:64-70 overrides)"""

    num_levels: int = 2
    cg_iter: int = 100
    tol: float = 1e-4
    mg_iterations: int = 1
    mg_smoothing_iterations: int = 2
    full_multigrid: bool = True
    zero_init: bool = False
    symmetric_gs: bool = True
    # smoother: "gs" = reference-parity multicolor Gauss-Seidel;
    # "chebyshev" = TPU-fast polynomial smoother (1 apply per degree)
    smoother: str = "gs"
    cheb_degree: int = 2
    # Mixed-precision iterative refinement (float32 problems only): the
    # TO systems are too ill-conditioned for a pure-fp32 residual — with
    # |u| ~ 1e3-1e4 the fp32 matvec's rounding noise exceeds the 1e-4
    # force-residual target, silently stalling CG several percent away
    # from equilibrium. The fix: measure the TRUE residual in float64
    # (~5x an fp32 apply on TPU, used once per refinement), solve the
    # correction system in fp32 MGPCG, and accumulate u in float64.
    # Requires jax x64 mode (ndr_tpu.utils.jax_setup.setup enables it).
    mixed_precision: bool = True
    max_refinements: int = 6
    inner_tol: float = 3e-3
    # fused Pallas stiffness apply on the fine level: True/False or
    # "auto" (= 3-D grids of >= 2^17 elements on a TPU backend, where the
    # fused kernel measured ~3x faster than the XLA path; small/2-D grids
    # favor XLA)
    use_pallas: object = "auto"
    # levels whose Galerkin Ke exceeds this use the transfer-based apply
    ke_cache_limit_bytes: int = 1400 * 2**20
    # storage dtype for intermediate-level cached Ke on float32 problems.
    # NOTE: bfloat16 halves coarse-level HBM traffic but empirically
    # destroys preconditioner quality (the rounding perturbs the coarse
    # elements' rigid-body null space — the same ~1e5x amplification that
    # forces K0 to stay float64), so the default keeps float32.
    cached_ke_dtype: Optional[str] = None
    # power-iteration budget for the Chebyshev lambda_max estimate
    # (min'ed with the guaranteed pencil bound); 0 = use the bound alone
    # (a trace-time constant: no applies at hierarchy build). Default 0:
    # the on-device 256x128x128 sweep (logs/profile_oc_256_scan.json)
    # measured bound-only ITERATION-NEUTRAL at production scale
    # (cg_iters=1, compliance 252.525 vs 252.522) and 11% faster per OC
    # step (431.6 vs 487.3 ms) — the hierarchy rebuild sheds its 8
    # power-iteration applies per level per step.
    lmax_power_iters: int = 0
    # "mg" = multigrid V-cycle/FMG preconditioner; "jacobi" = block-Jacobi
    # PCG with no hierarchy. The reference shares our divisibility
    # constraint (MultigridSolver.hh:37: grid must be divisible by
    # 2^numCoarseningLevels); for grids that cannot coarsen at all (e.g.
    # the 2D bridge's 250x125) make_mg_solver falls back to "jacobi"
    # automatically.
    precond: str = "mg"
    # Coarsest-level solve: "cholesky" (exact dense factorization; the
    # float64 parity path), "ns" (Jacobi-scaled Newton-Schulz inverse —
    # matmul-only, avoids the serial-structure-bound cho_factor that
    # costs ~70-80 ms/step on v5e at a 675-dof coarsest level), or
    # "auto" = ns for float32 hierarchies, cholesky for float64.
    coarse_solver: str = "auto"
    # Under a lagged preconditioner (solve(..., precond=leaves)), rebuild
    # level-0's density-dependent smoother state (young, Minv_rows, Dinv)
    # from the CURRENT density every solve — one node_diag_blocks conv +
    # 3x3 block inverts, ~6 ms at 4.19M voxels vs the ~115 ms full
    # rebuild. The fine level is where OC's per-step density moves bite
    # the smoother hardest (level-l Galerkin entries average 8^l
    # elements), so this keeps the stale-hierarchy CG-iteration penalty
    # near zero at larger lag intervals. "transfer"-kind level 1 applies
    # R K_fine P and is refreshed transitively through the parent link.
    precond_refresh_fine: bool = True


# "auto" coarse-solver size gate: Newton-Schulz costs ~30 dense n^3
# matmul pairs at HIGHEST precision per hierarchy (re)build, so it only
# beats the ~70-80 ms serial cho_factor when the coarsest system is
# small. At the 256-class production point (675 DoFs) the NS build is
# ~1-2 ms; at the 2D MBB mgl=2 coarsest (3,952 DoFs) it is ~0.2 s —
# rebuilt EVERY OC step this regressed the 2D bench 14x (BENCH_r04,
# VERDICT r4 weak-2). Gate chosen between those operating points.
NS_AUTO_MAX_DOFS = 1536


def _resolve_coarse_solver(settings: "MGSolverSettings",
                           levels: List[LevelState]) -> str:
    if settings.coarse_solver != "auto":
        return settings.coarse_solver
    if levels[-1].Ke.dtype != jnp.float32:
        return "cholesky"
    lv = levels[-1]
    ndofs = lv.grid.num_nodes * lv.grid.ndim
    return "ns" if ndofs <= NS_AUTO_MAX_DOFS else "cholesky"


def _refresh_fine_level(cfg: MGConfig, levels: List[LevelState],
                        young: jnp.ndarray) -> List[LevelState]:
    """Rebuild level-0's density-dependent smoother state from the
    CURRENT density inside a lagged-preconditioner solve (see
    MGSolverSettings.precond_refresh_fine). Coarse Galerkin Ke /
    Minv / the coarsest factor keep their lagged values."""
    lv0 = levels[0]
    M0 = ops.node_diag_blocks(young, cfg.K0, lv0.grid)
    kw = dict(young=young, Minv_rows=M0)
    if lv0.Dinv is not None:
        kw["Dinv"] = ops.invert_blocks(M0)
    out = [dataclasses.replace(lv0, **kw)]
    for lv in levels[1:]:
        # rewire the parent chain so "transfer"-kind applies (R K_parent P)
        # reach the refreshed fine level
        if lv.parent is not None:
            lv = dataclasses.replace(lv, parent=out[-1])
        out.append(lv)
    return out


def _use_refined(prob: FEMProblem, settings: MGSolverSettings) -> bool:
    return (
        settings.mixed_precision
        and prob.force.dtype == jnp.float32
        and jax.config.jax_enable_x64
    )


def mgpcg_solve(
    cfg: MGConfig,
    prob: FEMProblem,
    rho: jnp.ndarray,
    u0: Optional[jnp.ndarray],
    settings: MGSolverSettings,
    masks: Optional[Sequence[jnp.ndarray]] = None,
    precond_state=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full MGPCG equilibrium solve K(rho) u = f.

    Rebuilds the Galerkin hierarchy for the given densities, factors the
    coarsest level, then runs the MG-preconditioned CG from the warm start
    (reference: MultigridComplianceObjective::updateCache +
    preconditionedConjugateGradient). For float32 problems with
    ``settings.mixed_precision`` the solve runs as float64 iterative
    refinement around the fp32 MGPCG (see MGSolverSettings).

    ``precond_state`` (optional): a lagged ``(levels, chol)`` pair from
    :func:`build_precond_leaves` / :func:`levels_from_leaves`, built at
    an EARLIER density. The CG operator (and the refined path's true
    residual) always uses the CURRENT ``rho`` exactly — a stale
    hierarchy only preconditions, so it costs CG iterations, never
    correctness. Under OC's move limit the density drifts slowly, so
    rebuilding the ~100 ms hierarchy every k steps amortizes it away.
    """
    if _use_refined(prob, settings):
        return _mgpcg_solve_refined(cfg, prob, rho, u0, settings, masks,
                                    precond_state)
    young = prob.young(rho)
    if precond_state is None:
        levels = build_level_states(
            cfg, prob, young, smoother=settings.smoother,
            power_iters=settings.lmax_power_iters,
            use_pallas=resolve_use_pallas(settings.use_pallas, prob.grid),
            cached_ke_dtype=settings.cached_ke_dtype, masks=masks)
        lv0_op = levels[0]
    else:
        levels, _pchol = precond_state
        if settings.precond_refresh_fine:
            levels = _refresh_fine_level(cfg, levels, young)
            lv0_op = levels[0]
        else:
            lv0_op = dataclasses.replace(levels[0], young=young)

    def apply_a(u):
        return _zero_dirichlet(lv0_op, _apply_k_level(lv0_op, _zero_dirichlet(lv0_op, u)))

    if settings.precond == "jacobi":
        Dinv0 = (levels[0].Dinv if levels[0].Dinv is not None
                 else ops.invert_blocks(levels[0].Minv_rows))

        def precond(r):
            z = jnp.einsum("...ij,...j->...i", Dinv0, r,
                           precision=_HIGHEST)
            return _zero_dirichlet(levels[0], z)
    else:
        chol = (_pchol if precond_state is not None else
                factor_coarsest(levels, _resolve_coarse_solver(settings, levels)))

        def precond(r):
            s = mg_preconditioner(
                levels, chol, r,
                settings.mg_iterations,
                settings.mg_smoothing_iterations,
                settings.full_multigrid,
                settings.smoother,
                settings.cheb_degree,
            )
            return _zero_dirichlet(levels[0], s)

    b = _zero_dirichlet(levels[0], prob.force)
    if u0 is None or settings.zero_init:
        u0 = jnp.zeros_like(b)
    u0 = _zero_dirichlet(levels[0], u0)
    return solvers.conjugate_gradient(
        apply_a, b, u0, tol=settings.tol, max_iter=settings.cg_iter, precond=precond
    )


def _mgpcg_solve_refined(
    cfg: MGConfig,
    prob: FEMProblem,
    rho: jnp.ndarray,
    u0: Optional[jnp.ndarray],
    settings: MGSolverSettings,
    masks: Optional[Sequence[jnp.ndarray]] = None,
    precond_state=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Float64 iterative refinement around the fp32 MGPCG.

    Outer loop (float64): r = b - K u computed with an exact-operator
    float64 apply; stop when ||r|| <= tol * ||b|| — the same physically
    meaningful criterion as the reference (MultigridSolver.hh:704-708),
    now measured on the *true* residual. Inner loop: fp32 MGPCG on the
    correction system to `inner_tol` relative reduction.

    With ``precond_state`` the hierarchy rebuild is skipped: the lagged
    levels drive the preconditioner only, while the fp32 operator and the
    float64 true residual use the CURRENT density (see mgpcg_solve).
    """
    f32, f64 = jnp.float32, jnp.float64
    young32 = prob.young(rho).astype(f32)
    use_pallas = resolve_use_pallas(settings.use_pallas, prob.grid)
    if precond_state is None:
        levels = build_level_states(
            cfg, prob, young32, smoother=settings.smoother,
            power_iters=settings.lmax_power_iters,
            use_pallas=use_pallas,
            cached_ke_dtype=settings.cached_ke_dtype, masks=masks)
        lv0 = levels[0]
    else:
        levels, _pchol = precond_state
        if settings.precond_refresh_fine:
            levels = _refresh_fine_level(cfg, levels, young32)
            lv0 = levels[0]
        else:
            lv0 = dataclasses.replace(levels[0], young=young32)

    K0_64 = jnp.asarray(np.asarray(cfg.K0), f64)
    young64 = ops.element_young_modulus(
        rho.astype(f64), prob.E0, prob.Emin, prob.gamma
    )

    def zero_d64(v):
        return jnp.where(lv0.dirichlet_mask, 0.0, v)

    if use_pallas and settings.tol >= 1e-6:
        # two-float fused residual apply: ~4x cheaper than the
        # software-emulated float64 XLA apply (v5e has no native f64),
        # accurate to ~1e-11 relative — plenty for production tolerances;
        # deeper-tol solves keep the exact f64 apply
        # (see pallas_kernels.apply_k_pallas_df)
        from ndr_tpu.fem import pallas_kernels as pk

        y_hi = young64.astype(f32)
        y_lo = (young64 - y_hi.astype(f64)).astype(f32)
        force64 = prob.force.astype(f64)

        def residual64(u):
            u_hi = u.astype(f32)
            u_lo = (u - u_hi.astype(f64)).astype(f32)
            ku = pk.apply_k_pallas_df_fine(
                u_hi, u_lo, y_hi, y_lo, np.asarray(cfg.K0), lv0.grid
            )
            return zero_d64(force64 - ku)
    else:
        def residual64(u):
            return zero_d64(
                prob.force.astype(f64)
                - ops.apply_k(u, young64, K0_64, lv0.grid)
            )

    def apply_a32(v):
        return _zero_dirichlet(lv0, _apply_k_level(lv0, _zero_dirichlet(lv0, v)))

    if settings.precond == "jacobi":
        Dinv0 = (lv0.Dinv if lv0.Dinv is not None
                 else ops.invert_blocks(lv0.Minv_rows))

        def precond32(r):
            z = jnp.einsum("...ij,...j->...i", Dinv0, r,
                           precision=_HIGHEST)
            return _zero_dirichlet(lv0, z)
    else:
        chol = (_pchol if precond_state is not None else
                factor_coarsest(levels, _resolve_coarse_solver(settings, levels)))

        def precond32(r):
            s = mg_preconditioner(
                levels, chol, r, settings.mg_iterations,
                settings.mg_smoothing_iterations, settings.full_multigrid,
                settings.smoother, settings.cheb_degree,
            )
            return _zero_dirichlet(lv0, s)

    b64 = zero_d64(prob.force.astype(f64))
    b_norm = jnp.linalg.norm(b64.reshape(-1))
    if u0 is None or settings.zero_init:
        u = jnp.zeros(b64.shape, f64)
    else:
        u = zero_d64(u0.astype(f64))

    # The float64 residual apply is the single most expensive op at large
    # 3-D sizes (~262 ms vs 6.8 ms for the fp32 Pallas apply at 4.19M
    # voxels). The correction system's own fp32 residual is trustworthy
    # relative to ||r|| (cancellation noise ~1e-7 |K||e| << ||r||), so
    # instead of re-measuring the true residual after every refinement we
    # solve ONE correction targeting the final tolerance directly, with a
    # cond-guarded second pass only when the required reduction exceeds
    # what a single fp32 solve can deliver (cold starts).
    tiny = jnp.asarray(1e-300, f64)
    fp32_floor = 5e-4  # smallest reduction one fp32 CG pass can deliver

    def needed_reduction(r):
        rn = jnp.maximum(jnp.linalg.norm(r.reshape(-1)), tiny)
        return settings.tol * b_norm / rn

    def body(state):
        u, r, done, it_tot, k = state
        needed = needed_reduction(r)
        inner_tol = jnp.clip(0.5 * needed, fp32_floor, 0.9).astype(f32)
        e32, iters = solvers.conjugate_gradient(
            apply_a32, r.astype(f32), jnp.zeros(r.shape, f32),
            tol=inner_tol, max_iter=settings.cg_iter, precond=precond32,
        )
        u = u + e32.astype(f64)
        # if the requested reduction wasn't floor-limited, the correction
        # solve's own (trustworthy) stopping criterion already implies
        # the outer tolerance — no extra float64 residual needed
        done = 0.5 * needed >= fp32_floor
        r = jax.lax.cond(done, lambda v: r, residual64, u)
        return u, r, done, it_tot + iters, k + 1

    def cond(state):
        u, r, done, it_tot, k = state
        return (~done) & (k < settings.max_refinements)

    r0 = residual64(u)
    u, r, done, total_iters, k = jax.lax.while_loop(
        cond, body,
        (u, r0, jnp.asarray(False), jnp.asarray(0, jnp.int32),
         jnp.asarray(0, jnp.int32)),
    )
    return u, total_iters


def resolve_use_pallas(setting, grid: Grid) -> bool:
    if setting != "auto":
        return bool(setting)
    try:
        d = jax.devices()[0]
        on_tpu = "tpu" in f"{d.platform} {d.device_kind}".lower()
    except Exception:
        on_tpu = False
    return (on_tpu and grid.ndim == 3 and grid.degree == 1
            and grid.num_elements >= (1 << 17))


def max_feasible_coarsenings(grid: Grid) -> int:
    """How many 2x coarsenings the grid admits (all dims even each time;
    same constraint as the reference, MultigridSolver.hh:36-38)."""
    if grid.degree != 1:
        return 0  # coarsening machinery is degree-1 (see build_mg_config)
    n, dims = 0, grid.dims
    while all(d % 2 == 0 and d >= 2 for d in dims):
        dims = tuple(d // 2 for d in dims)
        n += 1
    return n


# ---------------------------------------------------------------------------
# Lagged preconditioner: carry the hierarchy across OC steps
#
# The Galerkin hierarchy + coarsest factor cost ~115 ms/step at
# 256x128x128 but only shape the PRECONDITIONER — under OC's move limit
# the density drifts slowly, so rebuilding every k steps trades a few CG
# iterations (usually none) for ~(k-1)/k of the rebuild cost. The state
# is exposed as a flat tuple of arrays ("leaves") so drivers can thread
# it through jit/lax.scan without registering LevelState as a pytree.
# (reference analogue: MultigridComplianceObjective::updateCache is also
# only re-run when the density changes — fem.py:64-70 caching.)
# ---------------------------------------------------------------------------

_PRECOND_FIELDS = ("young", "Ke", "Ke_stream", "Minv_rows", "Dinv", "lmax")


def precond_leaves(levels: List[LevelState], chol) -> tuple:
    """Flatten (levels, coarsest factor) into a tuple of arrays, in the
    canonical field order that :func:`levels_from_leaves` expects."""
    leaves = []
    for lv in levels:
        for f in _PRECOND_FIELDS:
            v = getattr(lv, f)
            if v is not None:
                leaves.append(v)
    if chol is not None:
        kind, data = chol
        leaves.append(data[0] if kind == "chol" else data)
    return tuple(leaves)


def levels_from_leaves(template, leaves, masks=None):
    """Reassemble ``(levels, chol)`` from a skeleton template (static
    fields concrete, density-dependent fields elided) plus the array
    leaves produced by :func:`precond_leaves`.

    ``masks``: optional per-level Dirichlet masks to substitute for the
    template's inlined numpy constants — pass the driver's jit-operand
    masks here so the solve-with-precond module does not re-inline
    ~15 MB of bool literals at 4M voxels."""
    t_levels, t_chol = template
    it = iter(leaves)
    out: List[LevelState] = []
    for l, lv in enumerate(t_levels):
        kw = {f: next(it) for f in _PRECOND_FIELDS
              if getattr(lv, f) is not None}
        if masks is not None:
            kw["dirichlet_mask"] = masks[l]
        if lv.parent is not None:
            kw["parent"] = out[-1]
        out.append(dataclasses.replace(lv, **kw))
    chol = None
    if t_chol is not None:
        kind, data = t_chol
        chol = (kind, (next(it), data[1])) if kind == "chol" else (kind, next(it))
    rest = list(it)
    if rest:
        raise ValueError(f"{len(rest)} extra precond leaves")
    return out, chol


def _skeletonize(levels: List[LevelState], chol, cfg: MGConfig):
    """Template capture: keep static fields concrete, replace the
    density-dependent arrays with ShapeDtypeStructs (drops tracers when
    called under jax.eval_shape).

    Runs INSIDE the eval_shape trace, where every jnp op — including
    ``jnp.asarray`` of a numpy constant in build_level_states — yields a
    tracer. The density-independent mask fields are therefore restored
    from the concrete ``cfg`` levels (numpy), never taken from ``lv``."""
    sk: List[LevelState] = []
    for l, lv in enumerate(levels):
        kw = {}
        for f in _PRECOND_FIELDS:
            v = getattr(lv, f)
            if v is not None:
                kw[f] = jax.ShapeDtypeStruct(jnp.shape(v), v.dtype)
        kw["dirichlet_mask"] = cfg.levels[l].dirichlet_mask
        kw["color_masks"] = cfg.levels[l].color_masks
        if lv.parent is not None:
            kw["parent"] = sk[-1]
        sk.append(dataclasses.replace(lv, **kw))
    t_chol = None
    if chol is not None:
        kind, data = chol
        if kind == "chol":
            c = data[0]
            t_chol = (kind, (jax.ShapeDtypeStruct(jnp.shape(c), c.dtype),
                             data[1]))
        else:
            t_chol = (kind, jax.ShapeDtypeStruct(jnp.shape(data), data.dtype))
    return sk, t_chol


def _build_precond_levels(cfg: MGConfig, prob: FEMProblem, rho: jnp.ndarray,
                          settings: MGSolverSettings,
                          masks: Optional[Sequence[jnp.ndarray]] = None):
    young = prob.young(rho)
    if _use_refined(prob, settings):
        young = young.astype(jnp.float32)
    levels = build_level_states(
        cfg, prob, young, smoother=settings.smoother,
        power_iters=settings.lmax_power_iters,
        use_pallas=resolve_use_pallas(settings.use_pallas, prob.grid),
        cached_ke_dtype=settings.cached_ke_dtype, masks=masks)
    chol = None
    if settings.precond != "jacobi":
        chol = factor_coarsest(levels, _resolve_coarse_solver(settings, levels))
    return levels, chol


def build_precond_leaves(cfg: MGConfig, prob: FEMProblem, rho: jnp.ndarray,
                         settings: MGSolverSettings,
                         masks: Optional[Sequence[jnp.ndarray]] = None) -> tuple:
    """Jittable: hierarchy + coarsest factor for ``rho``, flattened."""
    return precond_leaves(*_build_precond_levels(cfg, prob, rho, settings,
                                                 masks=masks))


def make_precond_template(cfg: MGConfig, prob: FEMProblem,
                          settings: MGSolverSettings,
                          masks: Optional[Sequence[jnp.ndarray]] = None):
    """Capture the static (levels, chol) skeleton without computing
    anything (jax.eval_shape trace of the hierarchy build)."""
    ydt = jnp.float32 if _use_refined(prob, settings) else prob.force.dtype
    captured = []

    def probe(rho):
        levels, chol = _build_precond_levels(cfg, prob, rho, settings,
                                             masks=masks)
        captured.append(_skeletonize(levels, chol, cfg))
        return precond_leaves(levels, chol)

    jax.eval_shape(probe, jax.ShapeDtypeStruct(prob.grid.dims, ydt))
    return captured[0]


def make_mg_solver(prob: FEMProblem, settings: MGSolverSettings):
    """Returns a SolveFn (rho, u0) -> (u, iters) closure for topopt.

    Requested coarsenings are clamped to what the grid dims admit; a grid
    that cannot coarsen at all (e.g. the 2D bridge's 250x125) falls back
    to block-Jacobi PCG (`precond="jacobi"`).
    """
    nl = min(settings.num_levels, max_feasible_coarsenings(prob.grid))
    if settings.precond == "jacobi" or nl == 0:
        settings = dataclasses.replace(settings, precond="jacobi", num_levels=0)
        nl = 0
    elif nl != settings.num_levels:
        settings = dataclasses.replace(settings, num_levels=nl)
    cfg = build_mg_config(prob, nl,
                          ke_cache_limit_bytes=settings.ke_cache_limit_bytes)

    _tpl_cache = []

    def precond_template():
        if not _tpl_cache:
            _tpl_cache.append(make_precond_template(cfg, prob, settings))
        return _tpl_cache[0]

    def solve(rho, u0=None, prob=prob, masks=None, precond=None):
        # `prob`/`masks` overrides let a driver pass the problem arrays
        # (force, fine+coarse Dirichlet masks) as jit OPERANDS instead of
        # closure constants — at 4M voxels the inlined force + masks are
        # ~40-65 MB of StableHLO literals per traced module, enough to
        # crash the remote compile service (TODO.md)
        #
        # `precond`: lagged-preconditioner leaves from solve.build_precond
        # — skips the per-solve hierarchy rebuild (see mgpcg_solve).
        pstate = None
        if precond is not None:
            pstate = levels_from_leaves(precond_template(), precond,
                                        masks=masks)
        return mgpcg_solve(cfg, prob, rho, u0, settings, masks=masks,
                           precond_state=pstate)

    def build_precond(rho, prob=prob, masks=None):
        return build_precond_leaves(cfg, prob, rho, settings, masks=masks)

    solve.cfg = cfg
    solve.settings = settings
    solve.build_precond = build_precond
    solve.precond_template = precond_template
    return solve
