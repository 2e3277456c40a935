"""Periodic homogenization tests.

Validation strategy: uniform cells must reproduce the base material
exactly; a laminate must match the classical closed-form laminate
tensor along/across layers; the density gradient must pass centered
finite differences; isotropic projection must round-trip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ndr_tpu.fem import element as el
from ndr_tpu.fem import homogenization as hom
from ndr_tpu.grid import make_grid


def _setup(dims, E=1.0, nu=0.3):
    grid = make_grid(dims, [[0] * len(dims), [1] * len(dims)])
    mat = el.IsotropicMaterial(E, nu, grid.ndim)
    K0 = el.element_stiffness_matrix(
        tuple([1] * grid.ndim), grid.stretchings, mat
    )
    return grid, mat, jnp.asarray(K0)


@pytest.mark.parametrize("dims", [(4, 4), (4, 2, 2)])
def test_uniform_cell_recovers_base_material(dims):
    grid, mat, K0 = _setup(dims)
    rho = jnp.ones(grid.dims)
    w = hom.solve_cell_problems(rho, grid, mat, K0, tol=1e-12)
    # uniform cell: fluctuations vanish
    assert float(jnp.abs(w).max()) < 1e-8
    Eh = np.asarray(hom.homogenized_elasticity_tensor(w, rho, grid, mat))
    lam, mu = mat.lame
    D = hom.isotropic_voigt(lam, mu, grid.ndim)
    np.testing.assert_allclose(Eh, D, atol=1e-8)


def test_laminate_matches_closed_form():
    """2-phase laminate (layers normal to x): Eh must match the classic
    laminate (Backus) formulas; in particular 1/E along the normal
    follows the harmonic mean of the 'P-wave' moduli."""
    grid, mat, K0 = _setup((8, 8))
    rho_vals = np.ones(grid.dims)
    rho_vals[: grid.dims[0] // 2] = 0.25  # half the cell is soft
    rho = jnp.asarray(rho_vals)
    w = hom.solve_cell_problems(rho, grid, mat, K0, tol=1e-12)
    Eh = np.asarray(hom.homogenized_elasticity_tensor(w, rho, grid, mat))

    lam, mu = mat.lame
    phases = [(0.5, 0.25), (0.5, 1.0)]  # (volume fraction, density scale)

    def avg(f):
        return sum(frac * f(s * lam, s * mu) for frac, s in phases)

    # Backus laminate formulas (layer normal = x):
    M = avg(lambda l, m: 0) + 0  # placeholder
    inv_M = avg(lambda l, m: 1.0 / (l + 2 * m))
    lam_over_M = avg(lambda l, m: l / (l + 2 * m))
    C11 = 1.0 / inv_M
    C12 = lam_over_M / inv_M
    C22 = avg(lambda l, m: (l + 2 * m) - l * l / (l + 2 * m)) + lam_over_M ** 2 / inv_M
    G = 1.0 / avg(lambda l, m: 1.0 / m)  # shear: harmonic mean

    np.testing.assert_allclose(Eh[0, 0], C11, rtol=1e-6)
    np.testing.assert_allclose(Eh[0, 1], C12, rtol=1e-6)
    np.testing.assert_allclose(Eh[1, 1], C22, rtol=1e-6)
    np.testing.assert_allclose(Eh[2, 2], G, rtol=1e-6)
    # symmetry
    np.testing.assert_allclose(Eh, Eh.T, atol=1e-9)


def test_homogenized_gradient_vs_fd():
    grid, mat, K0 = _setup((4, 4))
    rng = np.random.default_rng(0)
    rho0 = jnp.asarray(rng.uniform(0.3, 1.0, size=grid.dims))

    def Eh_of(rho):
        w = hom.solve_cell_problems(rho, grid, mat, K0, tol=1e-13)
        return hom.homogenized_elasticity_tensor(w, rho, grid, mat)

    w0 = hom.solve_cell_problems(rho0, grid, mat, K0, tol=1e-13)
    grad = np.asarray(hom.homogenized_tensor_gradient(w0, grid, mat, K0))

    d = rng.standard_normal(grid.dims)
    d /= np.linalg.norm(d)
    h = 1e-6
    fd = (np.asarray(Eh_of(rho0 + h * d)) - np.asarray(Eh_of(rho0 - h * d))) / (2 * h)
    an = np.einsum("xy st,xy->st", grad, d)
    np.testing.assert_allclose(an, fd, atol=2e-5 * max(1.0, np.abs(fd).max()))


def test_closest_isotropic_roundtrip():
    for ndim in (2, 3):
        mat = el.IsotropicMaterial(2.0, 0.25, ndim)
        lam, mu = mat.lame
        C = mat.full_tensor()
        lam2, mu2 = hom.closest_isotropic_lame(C)
        np.testing.assert_allclose([lam2, mu2], [lam, mu], rtol=1e-12)
        # voigt <-> full consistency
        D = hom.isotropic_voigt(lam, mu, ndim)
        C2 = hom.voigt_to_full(D, ndim)
        np.testing.assert_allclose(C2, C, atol=1e-12)
        # anisotropic perturbation: projection reduces Frobenius distance
        Cp = C.copy()
        Cp[0, 0, 0, 0] *= 1.3
        lam3, mu3 = hom.closest_isotropic_lame(Cp)
        Ciso = el.IsotropicMaterial(1, 1, ndim)  # placeholder for structure
        lamF = lam3 * np.einsum("ij,kl->ijkl", np.eye(ndim), np.eye(ndim))
        I4 = 0.5 * (
            np.einsum("ik,jl->ijkl", np.eye(ndim), np.eye(ndim))
            + np.einsum("il,jk->ijkl", np.eye(ndim), np.eye(ndim))
        )
        C3 = lamF + 2 * mu3 * I4
        assert np.linalg.norm(C3 - Cp) <= np.linalg.norm(C - Cp) + 1e-12


def test_microstructure_design_matches_target():
    """Gradient-based designer recovers a laminate's homogenized tensor
    (replaces the reference's Knitro module + toy gradientDescent)."""
    from ndr_tpu.fem import microstructure as ms

    grid, mat, K0 = _setup((8, 8))
    rho_t = np.ones(grid.dims)
    rho_t[:4] = 0.3
    w = hom.solve_cell_problems(jnp.asarray(rho_t), grid, mat, K0, tol=1e-11)
    target = hom.homogenized_elasticity_tensor(w, jnp.asarray(rho_t), grid, mat, K0)

    rng = np.random.default_rng(0)
    rho0 = jnp.asarray(rng.uniform(0.3, 0.7, grid.dims))
    res = ms.design_microstructure(
        target, grid, mat, rho0=rho0, steps=150, learning_rate=0.3,
        log=lambda s: None,
    )
    assert res.history[-1] < 1e-4, res.history[-1]
