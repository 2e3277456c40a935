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

    Args:
      u: node displacement field, nodes_per_dim + (N,).
      young: per-element Young modulus field, shape ``dims``.
      K0: full-density element stiffness (dofs_pe, dofs_pe).

    (reference: TensorProductSimulator.hh:905-952 applyK)
    """
    npe, N = grid.nodes_per_elem, grid.ndim
    ue = gather_element_displacements(u, grid)                 # (dims, npe, N)
    ue_flat = ue.reshape(grid.dims + (npe * N,))
    # K0 is symmetric: u^T K0 == (K0 u)^T, one big MXU matmul over elements
    fe = jnp.einsum(
        "...i,ij->...j", ue_flat, K0.astype(ue_flat.dtype),
        preferred_element_type=ue_flat.dtype,
    )
    fe = fe * young[..., None]
    return scatter_element_forces(fe.reshape(grid.dims + (npe, N)), grid)


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
    ue = gather_element_displacements(u, grid).reshape(grid.dims + (npe * N,))
    fe = jnp.einsum(
        "...ij,...j->...i", Ke.astype(ue.dtype), ue,
        preferred_element_type=ue.dtype,
    )
    return scatter_element_forces(fe.reshape(grid.dims + (npe, N)), grid)


def node_diag_blocks(
    young: jnp.ndarray, K0: jnp.ndarray, grid: Grid
) -> jnp.ndarray:
    """Per-node NxN diagonal blocks M of the stiffness matrix.

    M[n] = sum over incident elements e of E_e * K0[local(n), local(n)]
    — the Gauss-Seidel smoother's diagonal (reference:
    MultigridSolver.hh:193-265 m_smoothNode, matrix-free branch).

    Returns nodes_per_dim + (N, N).
    """
    N = grid.ndim
    K0r = np.asarray(K0).reshape(grid.nodes_per_elem, N, grid.nodes_per_elem, N)
    out = jnp.zeros(grid.nodes_per_dim + (N, N), dtype=young.dtype)
    offs = local_node_offsets(grid)
    for j, o in enumerate(offs):
        block = jnp.asarray(K0r[j, :, j, :], dtype=young.dtype)
        out = out.at[_elem_slice(grid, o)].add(young[..., None, None] * block)
    return out


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
    ue = gather_element_displacements(u, grid).reshape(grid.dims + (npe * N,))
    K0u = jnp.einsum(
        "...i,ij->...j", ue, K0.astype(ue.dtype), preferred_element_type=ue.dtype
    )
    utku = jnp.sum(ue * K0u, axis=-1)
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
