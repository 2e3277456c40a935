"""Linear solvers: dense direct (coarsest level / tests) and plain CG.

The multigrid-preconditioned CG lives in :mod:`ndr_tpu.fem.multigrid`.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

# CG dot products must be true-f32 regardless of the ambient matmul
# precision (1-pass bf16 default corrupts alpha/beta — see
# multigrid._HIGHEST note)
_HIGHEST = jax.lax.Precision.HIGHEST
import numpy as np

from ndr_tpu.fem import operators as ops
from ndr_tpu.grid import Grid


def dense_pinned_matrix(young, K0, dirichlet_mask, grid: Grid) -> np.ndarray:
    """Dense stiffness matrix with Dirichlet DOFs pinned (NumPy, trace-time)."""
    K = ops.assemble_dense_k(np.asarray(young), np.asarray(K0), grid)
    mask_flat = np.asarray(dirichlet_mask).reshape(-1)
    return ops.pin_dirichlet_dense(K, mask_flat)


def dense_solve(
    young: jnp.ndarray,
    K0: jnp.ndarray,
    dirichlet_mask: jnp.ndarray,
    f: jnp.ndarray,
    grid: Grid,
) -> jnp.ndarray:
    """Direct dense Cholesky solve (traced; use only on small grids).

    Replaces the reference's CHOLMOD direct solve
    (TensorProductSimulator.hh:834-865) on the multigrid coarsest level.
    The dense pinned matrix is assembled *inside the traced program* from
    the per-element stiffnesses so it stays differentiable/jittable w.r.t.
    densities.
    """
    Ke = young[..., None, None] * K0              # (dims..., d, d)
    K = assemble_dense_k_traced(Ke, grid)
    mask = dirichlet_mask.reshape(-1)
    # pin fixed dofs: zero rows/cols, unit diagonal
    K = jnp.where(mask[:, None] | mask[None, :], 0.0, K)
    K = K + jnp.diag(mask.astype(K.dtype))
    rhs = jnp.where(mask, 0.0, f.reshape(-1))
    chol = jax.scipy.linalg.cho_factor(K, lower=True)
    x = jax.scipy.linalg.cho_solve(chol, rhs)
    return x.reshape(f.shape)


def assemble_dense_k_traced(Ke: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    """Assemble dense K from per-element matrices inside a traced program."""
    N = grid.ndim
    n_dofs = grid.num_nodes * N
    enodes = ops.element_node_flat_indices(grid)          # (ne, npe) numpy
    dofs = np.stack(
        [N * enodes + c for c in range(N)], axis=-1
    ).reshape(grid.num_elements, -1)                      # (ne, dofs_pe)
    rows = jnp.asarray(np.repeat(dofs[:, :, None], dofs.shape[1], axis=2))
    cols = jnp.asarray(np.repeat(dofs[:, None, :], dofs.shape[1], axis=1))
    K = jnp.zeros((n_dofs, n_dofs), dtype=Ke.dtype)
    Kef = Ke.reshape(grid.num_elements, dofs.shape[1], dofs.shape[1])
    return K.at[rows, cols].add(Kef)


class DenseCoarseSolver:
    """Cholesky factor cached per-density-update for the coarsest MG level."""

    def __init__(self, grid: Grid):
        self.grid = grid

    def factor(self, Ke: jnp.ndarray, dirichlet_mask: jnp.ndarray):
        K = assemble_dense_k_traced(Ke, self.grid)
        mask = dirichlet_mask.reshape(-1)
        K = jnp.where(mask[:, None] | mask[None, :], 0.0, K)
        K = K + jnp.diag(mask.astype(K.dtype))
        return jax.scipy.linalg.cho_factor(K, lower=True)

    def solve(self, chol, b: jnp.ndarray, dirichlet_mask: jnp.ndarray) -> jnp.ndarray:
        rhs = jnp.where(dirichlet_mask.reshape(-1), 0.0, b.reshape(-1))
        x = jax.scipy.linalg.cho_solve(chol, rhs)
        return x.reshape(b.shape)


def conjugate_gradient(
    apply_a: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: jnp.ndarray,
    tol: float = 1e-5,
    max_iter: int = 1000,
    precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Preconditioned) conjugate gradient with ||Kx-b|| <= tol*||b|| stopping.

    Restructured PCG matching the reference implementation
    (MultigridSolver.hh:679-732): the preconditioner is applied at the top
    of the loop so no application is wasted after convergence; the stopping
    criterion is the *force residual* relative to ||b||, independent of the
    initial guess and the preconditioner.

    ``apply_a`` must already encode Dirichlet projection (zeroed rows/cols);
    ``b`` and ``x0`` must be zero on constrained components.

    Returns (x, iterations).
    """
    if precond is None:
        precond = lambda r: r

    b_norm_sq = jnp.vdot(b, b, precision=_HIGHEST)
    r0 = b - apply_a(x0)

    def cond(state):
        x, r, d, r_minv_r, i = state
        return (i < max_iter) & (jnp.vdot(r, r, precision=_HIGHEST)
                                 > tol * tol * b_norm_sq)

    def body(state):
        x, r, d, r_minv_r_old, i = state
        s = precond(r)
        r_minv_r = jnp.vdot(r, s, precision=_HIGHEST)
        beta = jnp.where(i == 0, 0.0, r_minv_r / r_minv_r_old)
        d = s + beta * d
        ad = apply_a(d)
        alpha = r_minv_r / jnp.vdot(d, ad, precision=_HIGHEST)
        x = x + alpha * d
        r = r - alpha * ad
        return (x, r, d, r_minv_r, i + 1)

    state0 = (x0, r0, jnp.zeros_like(b), jnp.asarray(1.0, b.dtype), jnp.asarray(0, jnp.int32))
    x, r, _, _, iters = jax.lax.while_loop(cond, body, state0)
    return x, iters
