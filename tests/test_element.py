"""Quadrature exactness + element stiffness tests.

Mirrors the reference test strategy (SURVEY.md §4):
  * exact-polynomial quadrature tests
    (reference: VoxelFEM/tests/test_tp_gauss_quadrature.cc)
  * K0 validated against the analytically known plane-stress Q4 stiffness
    (the classic 99-line topopt KE) and basic mechanical invariants.
"""

import itertools

import numpy as np
import pytest

from ndr_tpu.fem import element as el


# ---------------------------------------------------------------------------
# Quadrature
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_quadrature_exact_polynomials(ndim):
    """Integrate all monomials up to degree 9 per dim; compare analytic."""
    rng = np.random.default_rng(0)
    max_deg = 5 if ndim == 3 else 9
    for exps in itertools.product(range(max_deg + 1), repeat=ndim):
        coef = rng.uniform(0.5, 2.0)

        def f(p, exps=exps, coef=coef):
            return coef * np.prod([p[d] ** exps[d] for d in range(ndim)])

        exact = coef * np.prod([1.0 / (e + 1) for e in exps])
        approx = el.integrate_nd(f, exps)
        assert abs(approx - exact) < 5e-14 * max(1.0, abs(exact))


def test_lagrange_partition_of_unity():
    for deg in (1, 2, 3):
        x = np.linspace(0, 1, 17)
        vals = el.lagrange_values_1d(deg, x)
        np.testing.assert_allclose(vals.sum(axis=0), 1.0, atol=1e-13)
        ders = el.lagrange_derivs_1d(deg, x)
        np.testing.assert_allclose(ders.sum(axis=0), 0.0, atol=1e-12)
        # Kronecker property at the nodes
        nodes = el.lagrange_nodes_1d(deg)
        np.testing.assert_allclose(
            el.lagrange_values_1d(deg, nodes), np.eye(deg + 1), atol=1e-13
        )


# ---------------------------------------------------------------------------
# Element stiffness
# ---------------------------------------------------------------------------

def _q4_plane_stress_ke(E=1.0, nu=0.3):
    """Analytic plane-stress Q4 stiffness for a *square* element.

    Standard closed form (as used in Sigmund's 99-line topopt code), written
    for node ordering (00, 01, 10, 11) i.e. our C-order local nodes with
    DOFs (x, y) per node.
    """
    k = np.array([
        1 / 2 - nu / 6, 1 / 8 + nu / 8, -1 / 4 - nu / 12, -1 / 8 + 3 * nu / 8,
        -1 / 4 + nu / 12, -1 / 8 - nu / 8, nu / 6, 1 / 8 - 3 * nu / 8,
    ])
    KE = E / (1 - nu ** 2) * np.array([
        [k[0], k[1], k[2], k[3], k[4], k[5], k[6], k[7]],
        [k[1], k[0], k[7], k[6], k[5], k[4], k[3], k[2]],
        [k[2], k[7], k[0], k[5], k[6], k[3], k[4], k[1]],
        [k[3], k[6], k[5], k[0], k[7], k[2], k[1], k[4]],
        [k[4], k[5], k[6], k[7], k[0], k[1], k[2], k[3]],
        [k[5], k[4], k[3], k[2], k[1], k[0], k[7], k[6]],
        [k[6], k[3], k[4], k[1], k[2], k[7], k[0], k[5]],
        [k[7], k[2], k[1], k[4], k[3], k[6], k[5], k[0]],
    ])
    # Sigmund's node order is (counterclockwise) 1=(0,0) 2=(1,0) 3=(1,1) 4=(0,1);
    # ours is C-order (0,0) (0,1) (1,0) (1,1). Permute accordingly.
    perm_nodes = [0, 3, 1, 2]  # ours[i] = sigmund[perm_nodes[i]]
    perm = []
    for n in perm_nodes:
        perm += [2 * n, 2 * n + 1]
    return KE[np.ix_(perm, perm)]


def test_k0_matches_classic_q4():
    mat = el.IsotropicMaterial(young=1.0, poisson=0.3, dim=2)
    K0 = el.element_stiffness_matrix((1, 1), [1.0, 1.0], mat)
    KE = _q4_plane_stress_ke()
    np.testing.assert_allclose(K0, KE, atol=1e-12)


@pytest.mark.parametrize("ndim,stretch", [
    (2, [1.0, 1.0]), (2, [0.01, 0.01]), (2, [0.3, 0.7]),
    (3, [1.0, 1.0, 1.0]), (3, [0.25, 0.5, 1.0]),
])
def test_k0_mechanical_invariants(ndim, stretch):
    mat = el.IsotropicMaterial(young=1.0, poisson=0.3, dim=ndim)
    degrees = tuple([1] * ndim)
    K0 = el.element_stiffness_matrix(degrees, stretch, mat)
    n = K0.shape[0]

    # symmetry + positive semidefiniteness
    np.testing.assert_allclose(K0, K0.T, atol=1e-13)
    w = np.linalg.eigvalsh(K0)
    assert w[0] > -1e-12

    # rigid-body modes: translations and infinitesimal rotations are null modes
    nodes = np.array(
        list(itertools.product(*[[0.0, s] for s in stretch]))
    )  # C-order corners (matches local node order for degree 1)
    n_rigid = ndim + ndim * (ndim - 1) // 2
    null = []
    for d in range(ndim):  # translations
        u = np.zeros((len(nodes), ndim))
        u[:, d] = 1.0
        null.append(u.ravel())
    for i in range(ndim):  # rotations
        for j in range(i + 1, ndim):
            u = np.zeros((len(nodes), ndim))
            u[:, i] = nodes[:, j]
            u[:, j] = -nodes[:, i]
            null.append(u.ravel())
    for u in null:
        np.testing.assert_allclose(K0 @ u, 0.0, atol=1e-12)
    # exactly n_rigid zero eigenvalues
    assert (np.abs(w) < 1e-10).sum() == n_rigid

    # patch test: energy of a homogeneous strain field equals vol * eps:C:eps
    rng = np.random.default_rng(1)
    A = rng.normal(size=(ndim, ndim))
    u = (nodes @ A.T).ravel()  # linear displacement field u = A x
    eps = 0.5 * (A + A.T)
    sig = mat.contract(eps)
    vol = np.prod(stretch)
    energy = u @ K0 @ u
    np.testing.assert_allclose(energy, vol * np.sum(eps * sig), rtol=1e-12)


def test_constant_strain_load_consistency():
    """l[s] must equal K0 applied to the linear displacement field of E^s."""
    for ndim in (2, 3):
        mat = el.IsotropicMaterial(young=1.0, poisson=0.3, dim=ndim)
        degrees = tuple([1] * ndim)
        stretch = [0.5, 0.25, 1.0][:ndim]
        K0 = el.element_stiffness_matrix(degrees, stretch, mat)
        loads = el.constant_strain_load_matrix(degrees, stretch, mat)
        nodes = np.array(list(itertools.product(*[[0.0, s] for s in stretch])))
        strains = el.canonical_strains(ndim)
        for s, E in enumerate(strains):
            u = (nodes @ E.T).ravel()  # u = E x gives strain exactly E
            np.testing.assert_allclose(
                loads[s].ravel(), K0 @ u, atol=1e-12,
                err_msg=f"ndim={ndim} strain {s}",
            )
