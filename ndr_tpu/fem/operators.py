"""Matrix-free voxel-grid elasticity operators (pure XLA).

This is the TPU-native replacement for the reference's hottest code path,
``TensorProductSimulator::applyK`` (TensorProductSimulator.hh:905-952):
a per-element scatter/gather of the reference element stiffness matrix K0,
scaled by the SIMP Young modulus of each voxel.

Design notes (TPU-first):
  * The element gather/scatter is expressed as *shifted strided slices* of
    the node field — never an integer gather — so XLA lowers it to cheap
    dynamic-slice/pad fusions.
  * The per-element matvec ``(ne, dofs) @ (dofs, dofs)`` maps onto the MXU.
  * A Pallas kernel fusing gather + matvec + scatter into one VMEM pass is
    provided in :mod:`ndr_tpu.fem.pallas_kernels` and used automatically on
    TPU for large grids; this module is the always-correct reference path
    and the trace-time building block for everything else.

All functions are pure and jittable; shapes are static given a Grid.
"""

from __future__ import annotations

import itertools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ndr_tpu.grid import Grid

# explicit true-f32 contraction: without jax_setup.setup() the default
# matmul precision is 1-pass bf16 on TPU and on avx512bf16 XLA:CPU, which
# corrupts the stiffness apply (see multigrid._HIGHEST note)
_HIGHEST = jax.lax.Precision.HIGHEST


def local_node_offsets(grid: Grid) -> np.ndarray:
    """Local node multi-indices (C order), shape (nodes_per_elem, N).

    Matches ElementNodeIndexer flattening
    (reference: TensorProductSimulator.hh:244, 286-316).
    """
    ranges = [range(grid.degree + 1) for _ in grid.dims]
    return np.array(list(itertools.product(*ranges)), dtype=np.int64)


def _elem_slice(grid: Grid, offset: Sequence[int]) -> Tuple[slice, ...]:
    """Strided node-grid slice selecting local node `offset` of every element."""
    d = grid.degree
    return tuple(
        slice(int(o), int(o) + n * d, d) for o, n in zip(offset, grid.dims)
    )


def gather_element_displacements(u: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    """Gather nodal vectors of every element.

    Args:
      u: node field, nodes_per_dim + (N,).
    Returns:
      (dims..., nodes_per_elem, N) — local-node-ordered element DOFs.
    """
    offs = local_node_offsets(grid)
    parts = [u[_elem_slice(grid, o)] for o in offs]
    return jnp.stack(parts, axis=-2)


def scatter_element_forces(fe: jnp.ndarray, grid: Grid, dtype=None) -> jnp.ndarray:
    """Scatter-add per-element nodal forces back to the node grid.

    Args:
      fe: (dims..., nodes_per_elem, N) element contributions.
    Returns:
      node field nodes_per_dim + (N,).
    """
    dtype = dtype or fe.dtype
    out = jnp.zeros(grid.nodes_per_dim + (grid.ndim,), dtype=dtype)
    offs = local_node_offsets(grid)
    for j, o in enumerate(offs):
        out = out.at[_elem_slice(grid, o)].add(fe[..., j, :])
    return out


def element_young_modulus(rho: jnp.ndarray, E0, Emin, gamma) -> jnp.ndarray:
    """SIMP interpolation E = Emin + rho^gamma (E0 - Emin).

    (reference: TensorProductSimulator.hh:725-727)
    """
    return Emin + rho ** gamma * (E0 - Emin)


def apply_k(
    u: jnp.ndarray,
    young: jnp.ndarray,
    K0: jnp.ndarray,
    grid: Grid,
) -> jnp.ndarray:
    """Matrix-free stiffness apply  f = K(E) u  (no Dirichlet handling).

    TPU-first formulation: element DOFs are gathered into an
    *element-minor* matrix U of shape (dofs_pe, num_elements) so the
    per-element matvec is one MXU matmul ``K0 @ U`` whose lane dimension
    is the (large) element count; the SIMP modulus scales columns; the
    results scatter back through shifted-slice adds per scalar component
    (no integer gather/scatter anywhere).

    Args:
      u: node displacement field, nodes_per_dim + (N,).
      young: per-element Young modulus field, shape ``dims``.
      K0: full-density element stiffness (dofs_pe, dofs_pe).

    (reference: TensorProductSimulator.hh:905-952 applyK)
    """
    npe, N = grid.nodes_per_elem, grid.ndim
    offs = local_node_offsets(grid)
    dt = u.dtype
    # U rows in DOF order (node-major, component-minor)
    rows = [
        u[_elem_slice(grid, o) + (d,)].reshape(-1)
        for o in offs
        for d in range(N)
    ]
    U = jnp.stack(rows)                                   # (dofs_pe, ne)
    F = jnp.dot(K0.astype(dt), U, preferred_element_type=dt,
                precision=_HIGHEST)
    F = F * young.reshape(-1)[None, :]
    F = F.reshape(npe, N, *grid.dims)
    # scatter-add per (local node, component) into scalar node fields
    comps = []
    for d in range(N):
        out_d = jnp.zeros(grid.nodes_per_dim, dtype=dt)
        for j, o in enumerate(offs):
            out_d = out_d.at[_elem_slice(grid, o)].add(F[j, d])
        comps.append(out_d)
    return jnp.stack(comps, axis=-1)


def apply_k_cached(
    u: jnp.ndarray,
    Ke: jnp.ndarray,
    grid: Grid,
) -> jnp.ndarray:
    """Stiffness apply with per-element stiffness matrices.

    Used on Galerkin-coarsened multigrid levels where each element has its
    own Ke (reference: applyK with cachedElementStiffness,
    TensorProductSimulator.hh:915-932).

    Args:
      Ke: (dims..., dofs_pe, dofs_pe) per-element matrices.
    """
    npe, N = grid.nodes_per_elem, grid.ndim
    offs = local_node_offsets(grid)
    dt = u.dtype
    rows = [
        u[_elem_slice(grid, o) + (d,)].reshape(-1)
        for o in offs
        for d in range(N)
    ]
    U = jnp.stack(rows)                                   # (dofs_pe, ne)
    d_pe = npe * N
    Kef = Ke.reshape(-1, d_pe, d_pe).astype(dt)           # (ne, d, d)
    F = jnp.einsum("eij,je->ie", Kef, U, preferred_element_type=dt,
                   precision=_HIGHEST)
    F = F.reshape(npe, N, *grid.dims)
    comps = []
    for d in range(N):
        out_d = jnp.zeros(grid.nodes_per_dim, dtype=dt)
        for j, o in enumerate(offs):
            out_d = out_d.at[_elem_slice(grid, o)].add(F[j, d])
        comps.append(out_d)
    return jnp.stack(comps, axis=-1)


def node_diag_blocks(
    young: jnp.ndarray, K0: jnp.ndarray, grid: Grid
) -> jnp.ndarray:
    """Per-node NxN diagonal blocks M of the stiffness matrix.

    M[n] = sum over incident elements e of E_e * K0[local(n), local(n)]
    — the Gauss-Seidel smoother's diagonal (reference:
    MultigridSolver.hh:193-265 m_smoothNode, matrix-free branch).

    For degree-1 grids this is ONE 2^N-tap convolution of the modulus
    field (tap j = the constant K0 block of the local node opposite
    offset o_j): the per-local-node scatter-add formulation cost 2^N
    sequential full-array updates — measured 20 ms at a 4.3M-node fine
    level where the conv is a few HBM passes. Higher degrees keep the
    generic scatter (their node lattice is not a stride-1 shift of the
    element lattice).

    Returns nodes_per_dim + (N, N).
    """
    N = grid.ndim
    npe = grid.nodes_per_elem
    K0r = np.asarray(K0).reshape(npe, N, npe, N)
    offs = local_node_offsets(grid)
    if grid.degree != 1:
        out = jnp.zeros(grid.nodes_per_dim + (N, N), dtype=young.dtype)
        for j, o in enumerate(offs):
            block = jnp.asarray(K0r[j, :, j, :], dtype=young.dtype)
            out = out.at[_elem_slice(grid, o)].add(
                young[..., None, None] * block)
        return out
    # cross-correlation taps: node n gathers element n - o_j, i.e. the
    # padded-young window position k = 1 - o_j per dim
    W = np.zeros((N * N, 1) + (2,) * N, dtype=np.float64)
    for j, o in enumerate(offs):
        k = tuple(1 - int(x) for x in o)
        W[(slice(None), 0) + k] = K0r[j, :, j, :].reshape(N * N)
    W = jnp.asarray(W, young.dtype)
    pad = [(1, 1)] * N
    y = young[None, None]                      # (batch=1, feature=1, dims)
    out = jax.lax.conv_general_dilated(
        y, W, window_strides=(1,) * N, padding=pad,
        dimension_numbers=("NC" + "DHW"[-N:], "OI" + "DHW"[-N:],
                           "NC" + "DHW"[-N:]),
        precision=_HIGHEST,
    )[0]                                       # (N*N, nodes...)
    out = jnp.moveaxis(out, 0, -1)
    return out.reshape(grid.nodes_per_dim + (N, N))


def node_diag_blocks_cached(Ke: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    """Per-node diagonal blocks from per-element stiffness matrices."""
    N = grid.ndim
    npe = grid.nodes_per_elem
    Ker = Ke.reshape(grid.dims + (npe, N, npe, N))
    out = jnp.zeros(grid.nodes_per_dim + (N, N), dtype=Ke.dtype)
    offs = local_node_offsets(grid)
    for j, o in enumerate(offs):
        out = out.at[_elem_slice(grid, o)].add(Ker[..., j, :, j, :])
    return out


def node_diag_blocks_from_elem_diag(ke_diag: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    """Per-node diagonal blocks from per-element *diagonal-only* blocks
    (dims..., npe, N, N) — used on multigrid levels whose full Ke is not
    materialized."""
    N = grid.ndim
    out = jnp.zeros(grid.nodes_per_dim + (N, N), dtype=ke_diag.dtype)
    offs = local_node_offsets(grid)
    for j, o in enumerate(offs):
        out = out.at[_elem_slice(grid, o)].add(ke_diag[..., j, :, :])
    return out


def invert_blocks(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched 2x2 / 3x3 SPD blocks (..., N, N).

    Avoids jnp.linalg.inv, whose LU lowering has no float64 TPU kernel
    and is needlessly slow for tiny fixed-size blocks."""
    n = M.shape[-1]
    if n == 2:
        a, b = M[..., 0, 0], M[..., 0, 1]
        c, d = M[..., 1, 0], M[..., 1, 1]
        det = a * d - b * c
        inv = jnp.stack(
            [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2
        )
        return inv / det[..., None, None]
    if n == 3:
        m = [[M[..., i, j] for j in range(3)] for i in range(3)]
        c00 = m[1][1] * m[2][2] - m[1][2] * m[2][1]
        c01 = m[0][2] * m[2][1] - m[0][1] * m[2][2]
        c02 = m[0][1] * m[1][2] - m[0][2] * m[1][1]
        c10 = m[1][2] * m[2][0] - m[1][0] * m[2][2]
        c11 = m[0][0] * m[2][2] - m[0][2] * m[2][0]
        c12 = m[0][2] * m[1][0] - m[0][0] * m[1][2]
        c20 = m[1][0] * m[2][1] - m[1][1] * m[2][0]
        c21 = m[0][1] * m[2][0] - m[0][0] * m[2][1]
        c22 = m[0][0] * m[1][1] - m[0][1] * m[1][0]
        det = m[0][0] * c00 + m[0][1] * c10 + m[0][2] * c20
        inv = jnp.stack(
            [
                jnp.stack([c00, c01, c02], -1),
                jnp.stack([c10, c11, c12], -1),
                jnp.stack([c20, c21, c22], -1),
            ],
            -2,
        )
        return inv / det[..., None, None]
    raise NotImplementedError(f"block size {n}")


def zero_dirichlet(u: jnp.ndarray, dirichlet_mask: jnp.ndarray) -> jnp.ndarray:
    """Zero out Dirichlet-constrained components.

    (reference: MultigridSolver.hh:364-383 zeroOutDirichletComponents)
    """
    return jnp.where(dirichlet_mask, 0.0, u)


def compliance_gradient(
    u: jnp.ndarray,
    rho: jnp.ndarray,
    K0: jnp.ndarray,
    grid: Grid,
    E0,
    Emin,
    gamma,
) -> jnp.ndarray:
    """Adjoint gradient of compliance (1/2 f^T u) w.r.t. densities.

    g_e = -0.5 * gamma * rho^(gamma-1) * (E0-Emin) * u_e^T K0 u_e
    (reference: TensorProductSimulator.hh:730-751 complianceGradient)
    """
    npe, N = grid.nodes_per_elem, grid.ndim
    offs = local_node_offsets(grid)
    dt = u.dtype
    rows = [
        u[_elem_slice(grid, o) + (d,)].reshape(-1)
        for o in offs
        for d in range(N)
    ]
    U = jnp.stack(rows)                                   # (dofs_pe, ne)
    K0U = jnp.dot(K0.astype(dt), U, preferred_element_type=dt,
                  precision=_HIGHEST)
    utku = jnp.sum(U * K0U, axis=0).reshape(grid.dims)
    return -0.5 * gamma * rho ** (gamma - 1.0) * (E0 - Emin) * utku


# ---------------------------------------------------------------------------
# Dense assembly (NumPy; tests and tiny direct solves only)
# ---------------------------------------------------------------------------

def element_node_flat_indices(grid: Grid) -> np.ndarray:
    """Global flat node index of each element's local nodes, (ne, npe)."""
    offs = local_node_offsets(grid)
    nodes_pd = grid.nodes_per_dim
    elem_idx = np.array(
        list(itertools.product(*[range(n) for n in grid.dims])), dtype=np.int64
    )  # (ne, N) in C order
    first = elem_idx * grid.degree
    glob = first[:, None, :] + offs[None, :, :]        # (ne, npe, N)
    strides = np.cumprod([1] + list(nodes_pd[::-1][:-1]))[::-1]
    return glob @ strides


def assemble_dense_k(young: np.ndarray, K0: np.ndarray, grid: Grid) -> np.ndarray:
    """Assemble the full dense stiffness matrix (small grids only).

    (reference: TensorProductSimulator.hh:589-635 m_assembleStiffnessMatrix —
     here dense, used as the test oracle / coarsest-level direct solve)
    """
    N = grid.ndim
    n_dofs = grid.num_nodes * N
    K = np.zeros((n_dofs, n_dofs))
    enodes = element_node_flat_indices(grid)
    E = np.asarray(young).ravel()
    K0 = np.asarray(K0)
    for e in range(grid.num_elements):
        # interleave: node-major, component-minor
        dofs = np.stack([N * enodes[e] + c for c in range(N)], axis=1).ravel()
        K[np.ix_(dofs, dofs)] += E[e] * K0
    return K


def pin_dirichlet_dense(K: np.ndarray, mask_flat: np.ndarray) -> np.ndarray:
    """Zero fixed rows/cols and put 1 on their diagonal (zero-value BCs).

    Equivalent to the reference's rowColRemoval + solve on the reduced
    system (TensorProductSimulator.hh:845-858) for zero Dirichlet values.
    """
    K = K.copy()
    idx = np.where(mask_flat)[0]
    K[idx, :] = 0.0
    K[:, idx] = 0.0
    K[idx, idx] = 1.0
    return K
