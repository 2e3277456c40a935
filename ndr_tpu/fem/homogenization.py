"""Periodic homogenization of voxel microstructures.

TPU-native re-design of the reference's TPPeriodicHomogenization
(VoxelFEM/TPPeriodicHomogenization.hh) + periodic DoF machinery
(TensorProductSimulator.hh:1098-1132):

  * periodicity is imposed structurally — DoF fields live on the grid
    *without* the max-face node planes, and the stiffness apply
    wrap-expands/folds them (P^T K P with P the periodic prolongation),
    so no index remapping ever materializes;
  * rigid translation is removed by pinning node 0 (reference:
    m_getPeriodicConditionFixedVariables);
  * all 3 (2-D) / 6 (3-D) cell problems solve simultaneously via a
    vmapped block-Jacobi CG;
  * the homogenized tensor, its per-voxel density gradient, and the
    closest-isotropic projection (TensorProjection.hh:22-76) are batched
    einsums over elements.

Density convention: the reference scales both the constant-strain loads
and the homogenized-tensor integrand *linearly* in density
(Element_T::constantStrainLoad, homogenizedElasticityTensor) while
TPS::solve assembles K with the SIMP modulus — consistent only for
gamma=1, Emin=0, which is how the homogenization drivers use it. Here a
single ``modulus`` field scales both sides (pass rho for the linear
convention, or a SIMP-interpolated field explicitly).

Voigt ordering: (xx, yy[, zz, yz, xz], xy), *standard engineering
convention*: the returned D matrix satisfies sigma_v = D eps_v with
eps_v = (eps_xx, ..., 2 eps_yz, 2 eps_xz, 2 eps_xy); isotropic materials
give the classic D (lam+2mu / lam / mu on the shear diagonal). Both Eh
and its density gradient are evaluated through the symmetric energy
identity  e^s : C_h : e^t = (1/|Y|) int (e^s + eps(w^s)) : C :
(e^t + eps(w^t)), which needs no extra adjoint solve.
"""

from __future__ import annotations

import dataclasses
import itertools
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST  # see fem.multigrid._HIGHEST note
import numpy as np

from ndr_tpu.fem import element as el
from ndr_tpu.fem import operators as ops
from ndr_tpu.fem import solvers
from ndr_tpu.grid import Grid


def voigt_strains(ndim: int) -> np.ndarray:
    """Canonical unit strains in MeshFEM flat order, (S, N, N)."""
    out = [np.zeros((ndim, ndim)) for _ in range(ndim)]
    for i in range(ndim):
        out[i][i, i] = 1.0
    shear_pairs = {2: [(0, 1)], 3: [(1, 2), (0, 2), (0, 1)]}[ndim]
    for (i, j) in shear_pairs:
        E = np.zeros((ndim, ndim))
        E[i, j] = E[j, i] = 1.0
        out.append(E)
    return np.stack(out)


def num_strains(ndim: int) -> int:
    return ndim * (ndim + 1) // 2


# ---------------------------------------------------------------------------
# Periodic operator
# ---------------------------------------------------------------------------

def periodic_expand(u_dof: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """DoF field (dims..., N) -> full node field by wrapping the first
    planes onto the max faces (the periodic prolongation P)."""
    u = u_dof
    for axis in range(ndim):
        first = jax.lax.slice_in_dim(u, 0, 1, axis=axis)
        u = jnp.concatenate([u, first], axis=axis)
    return u


def periodic_fold(f_full: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Full node field -> DoF field, accumulating max-face values onto
    the min faces (P^T)."""
    f = f_full
    for axis in range(ndim):
        n = f.shape[axis]
        body = jax.lax.slice_in_dim(f, 0, n - 1, axis=axis)
        last = jax.lax.slice_in_dim(f, n - 1, n, axis=axis)
        first = jax.lax.slice_in_dim(body, 0, 1, axis=axis)
        body = jax.lax.dynamic_update_slice_in_dim(body, first + last, 0, axis)
        f = body
    return f


def _pin(u_dof: jnp.ndarray) -> jnp.ndarray:
    """Zero the pinned node-0 components (no-rigid-translation pin)."""
    flat = u_dof.reshape(-1, u_dof.shape[-1])
    flat = flat.at[0].set(0.0)
    return flat.reshape(u_dof.shape)


def periodic_apply_k(u_dof, modulus, K0, grid: Grid) -> jnp.ndarray:
    """f = P^T K(modulus) P u on periodic DoFs (pin handled by caller)."""
    u_full = periodic_expand(u_dof, grid.ndim)
    f_full = ops.apply_k(u_full, modulus, K0, grid)
    return periodic_fold(f_full, grid.ndim)


# ---------------------------------------------------------------------------
# Cell problems
# ---------------------------------------------------------------------------

def constant_strain_loads(modulus, grid: Grid, material: el.IsotropicMaterial):
    """Global periodic-DoF loads for each canonical strain, (S, dims..., N).

    rhs^s = P^T scatter(modulus_e * l^s) with l^s the per-element
    constant-strain load (reference: TPS::constantStrainLoad,
    TensorProductSimulator.hh:792-821).
    """
    degrees = tuple([grid.degree] * grid.ndim)
    loads = el.constant_strain_load_matrix(degrees, grid.stretchings, material)
    # reorder to Voigt flat order
    loads = loads[_canonical_to_voigt_perm(grid.ndim)]
    out = []
    for s in range(loads.shape[0]):
        le = jnp.asarray(loads[s], modulus.dtype)  # (npe, N)
        fe = modulus[..., None, None] * le
        f_full = ops.scatter_element_forces(fe, grid)
        out.append(periodic_fold(f_full, grid.ndim))
    return jnp.stack(out)


def _canonical_to_voigt_perm(ndim: int) -> np.ndarray:
    """Map element.canonical_strains order -> Voigt order."""
    cs = el.canonical_strains(ndim)
    vs = voigt_strains(ndim)
    perm = []
    for v in vs:
        for i, c in enumerate(cs):
            if np.allclose(c, v):
                perm.append(i)
                break
    return np.asarray(perm)


def solve_cell_problems(
    rho: jnp.ndarray,
    grid: Grid,
    material: el.IsotropicMaterial,
    K0: jnp.ndarray,
    tol: float = 1e-8,
    max_iter: int = 2000,
) -> jnp.ndarray:
    """Solve the S periodic cell problems; returns fluctuation fields
    w of shape (S, dims..., N) on periodic DoFs.

    (reference: TPPeriodicHomogenization::solveCellProblems — rhs is the
    load of the *negative* canonical strain.)
    """
    modulus = rho
    rhs = -constant_strain_loads(modulus, grid, material)
    rhs = jax.vmap(_pin)(rhs)

    # block-Jacobi preconditioner from periodic-folded diagonal blocks
    blocks_full = ops.node_diag_blocks(modulus, K0, grid)
    blocks = periodic_fold(
        blocks_full.reshape(blocks_full.shape[:-2] + (-1,)), grid.ndim
    ).reshape((-1,) + blocks_full.shape[-2:])
    inv = ops.invert_blocks(blocks).reshape(
        tuple(grid.dims) + (grid.ndim, grid.ndim)
    )

    def apply_a(u):
        return _pin(periodic_apply_k(_pin(u), modulus, K0, grid))

    def precond(r):
        return _pin(jnp.einsum("...ij,...j->...i", inv, r,
                               precision=_HIGHEST))

    def solve_one(b):
        x0 = jnp.zeros_like(b)
        x, iters = solvers.conjugate_gradient(
            apply_a, b, x0, tol=tol, max_iter=max_iter, precond=precond
        )
        return x

    return jax.vmap(solve_one)(rhs)


# ---------------------------------------------------------------------------
# Homogenized tensor + gradient
# ---------------------------------------------------------------------------

def average_strain_matrix(grid: Grid, material_dim: int) -> np.ndarray:
    """B-bar: element-average strains of nodal displacements, in Voigt
    order, shape (S, dofs_pe) acting on flattened element DOFs, producing
    *tensor* strain components (off-diagonals NOT doubled)."""
    degrees = tuple([grid.degree] * grid.ndim)
    stretch = grid.stretchings
    axes = [el.gauss_rule_for_degree(2 * d) for d in degrees]
    pts = np.array([p for p in itertools.product(*[a[0] for a in axes])])
    wts = np.array([np.prod(w) for w in itertools.product(*[a[1] for a in axes])])
    _, grads = el.shape_gradients_at(degrees, stretch, pts)  # (npe, Q, N)
    N = grid.ndim
    eye = np.eye(N)
    eps = 0.5 * (
        np.einsum("ci,aqj->acqij", eye, grads) + np.einsum("cj,aqi->acqij", eye, grads)
    )  # (npe, N, Q, N, N)
    avg = np.einsum("acqij,q->acij", eps, wts)  # integral over ref cube = average
    vs = voigt_strains(N)
    # tensor components: eps_ij for the (i,j) of each voigt entry
    B = np.zeros((vs.shape[0], grads.shape[0] * N))
    for s, V in enumerate(vs):
        i, j = np.argwhere(V)[0]
        B[s] = avg[:, :, i, j].reshape(-1)
    return B


def _shear_multiplicity(ndim: int) -> np.ndarray:
    """m_s = 1 for normal entries, 2 for shear entries (e^s has two unit
    components): converts the energy form B[s,t] = e^s : C_h : e^t to the
    engineering-Voigt D via D = B / (m_s m_t)."""
    S = num_strains(ndim)
    m = np.ones(S)
    m[ndim:] = 2.0
    return m


def _energy_form_per_element(w, grid: Grid, material, K0):
    """(dims..., S, S): per-element integrals
    int_e (e^s + eps(w^s)) : C : (e^t + eps(w^t))  (not density-scaled)."""
    N = grid.ndim
    S = num_strains(N)
    degrees = tuple([grid.degree] * grid.ndim)
    vs = voigt_strains(N)
    perm = _canonical_to_voigt_perm(N)
    loads = el.constant_strain_load_matrix(degrees, grid.stretchings, material)[perm]
    loads = jnp.asarray(loads.reshape(S, -1), w.dtype)     # (S, dofs)
    K0j = jnp.asarray(np.asarray(K0), w.dtype)

    C = material.full_tensor()
    const = np.einsum("sij,ijkl,tkl->st", vs, C, vs) * grid.element_volume
    const = jnp.asarray(const, w.dtype)

    def elem_dofs(w_s):
        u_full = periodic_expand(w_s, N)
        return ops.gather_element_displacements(u_full, grid).reshape(
            grid.dims + (-1,)
        )

    Ue = jax.vmap(elem_dofs)(w)                            # (S, dims..., dofs)
    cross = jnp.einsum("sd,t...d->...st", loads, Ue, precision=_HIGHEST)
    quad = jnp.einsum("s...d,de,t...e->...st", Ue, K0j, Ue,
                      precision=_HIGHEST)
    return const + cross + jnp.swapaxes(cross, -1, -2) + quad


def homogenized_elasticity_tensor(
    w: jnp.ndarray,
    rho: jnp.ndarray,
    grid: Grid,
    material: el.IsotropicMaterial,
    K0: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Homogenized tensor as the standard engineering-Voigt D, (S, S).

    Evaluated through the (symmetric, adjoint-free) energy identity
    e^s : C_h : e^t = (1/|Y|) sum_e rho_e int_e (e^s + eps(w^s)) : C :
    (e^t + eps(w^t)) — algebraically identical to the reference's
    stress-average form (TPPeriodicHomogenization.hh:74-104) at the cell
    problems' solution.
    """
    if K0 is None:
        degrees = tuple([grid.degree] * grid.ndim)
        K0 = el.element_stiffness_matrix(degrees, grid.stretchings, material)
    per_elem = _energy_form_per_element(w, grid, material, K0)
    B = jnp.einsum("...st,...->st", per_elem, rho,
                   precision=_HIGHEST) / grid.volume
    m = jnp.asarray(_shear_multiplicity(grid.ndim), B.dtype)
    return B / (m[:, None] * m[None, :])


def homogenized_tensor_gradient(
    w: jnp.ndarray,
    grid: Grid,
    material: el.IsotropicMaterial,
    K0: jnp.ndarray,
) -> jnp.ndarray:
    """d(Eh)/d(rho_e), shape (dims..., S, S).

    dD_e[s,t] = (1/|Y| m_s m_t) int_e (e^s + eps(w^s)) : C : (e^t + eps(w^t))
    expanded into stiffness/load/constant pieces so everything is an
    einsum over elements (reference: homogenizedElasticityTensorGradient,
    TPPeriodicHomogenization.hh:114-159; converted to engineering Voigt).
    """
    per_elem = _energy_form_per_element(w, grid, material, K0)
    m = jnp.asarray(_shear_multiplicity(grid.ndim), per_elem.dtype)
    return per_elem / (grid.volume * m[:, None] * m[None, :])


# ---------------------------------------------------------------------------
# Closest isotropic tensor (reference: TensorProjection.hh:22-76)
# ---------------------------------------------------------------------------

def closest_isotropic_lame(C_full: np.ndarray) -> Tuple[float, float]:
    """Frobenius-closest isotropic tensor's (lambda, mu) from a rank-4
    elasticity tensor via the J/K (hydrostatic/deviatoric) projection."""
    N = C_full.shape[0]
    C_ijij = np.einsum("ijij->", C_full)
    C_iijj = np.einsum("iijj->", C_full)
    n = float(N)
    CdotJ = C_iijj / n
    CdotK = C_ijij - CdotJ
    KdotK = 0.5 * (n * n + n) - 1.0
    alpha = CdotJ
    beta = CdotK / KdotK
    lam = (alpha - beta) / n
    mu = beta / 2.0
    return lam, mu


def isotropic_voigt(lam: float, mu: float, ndim: int) -> np.ndarray:
    """Standard engineering-Voigt D of an isotropic tensor
    (lam + 2mu on the normal diagonal, lam off-normal, mu on shear)."""
    S = num_strains(ndim)
    D = np.zeros((S, S))
    D[:ndim, :ndim] = lam
    for i in range(ndim):
        D[i, i] += 2 * mu
    for s in range(ndim, S):
        D[s, s] = mu
    return D


def voigt_to_full(D: np.ndarray, ndim: int) -> np.ndarray:
    """Engineering-Voigt D -> rank-4 tensor (every minor-symmetric copy
    C_{ijkl} equals the corresponding D entry)."""
    vs = voigt_strains(ndim)
    S = vs.shape[0]
    C = np.zeros((ndim,) * 4)
    for s in range(S):
        i, j = np.argwhere(vs[s])[0]
        for t in range(S):
            k, l = np.argwhere(vs[t])[0]
            val = D[s, t]
            for (a, b) in ((i, j), (j, i)):
                for (c, d) in ((k, l), (l, k)):
                    C[a, b, c, d] = val
    return C
