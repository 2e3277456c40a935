"""Field-calculus helper tests (ndr_tpu/ops/calculus.py — reference
utils.py:16-32 gradient/divergence/laplace) against closed forms, plus
the compiled-memory estimator (utils/memory.py — reference
SizeEstimator, utils.py:165-243)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndr_tpu.ops import calculus
from ndr_tpu.utils import memory


def _coords2(n=7):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(-1.0, 1.0, size=(n, 2)))


def test_gradient_closed_form():
    # f = x^2 y + sin(y); grad = (2xy, x^2 + cos(y))
    f = lambda p: p[0] ** 2 * p[1] + jnp.sin(p[1])
    c = _coords2()
    g = calculus.gradient(f)(c)
    x, y = np.asarray(c[:, 0]), np.asarray(c[:, 1])
    np.testing.assert_allclose(np.asarray(g),
                               np.stack([2 * x * y, x ** 2 + np.cos(y)], -1),
                               rtol=1e-12)


def test_gradient_batch_shape():
    f = lambda p: jnp.sum(p ** 3)
    c = _coords2(12).reshape(3, 4, 2)
    g = calculus.gradient(f)(c)
    assert g.shape == (3, 4, 2)
    np.testing.assert_allclose(np.asarray(g), 3 * np.asarray(c) ** 2,
                               rtol=1e-12)


def test_divergence_closed_form():
    # v = (x^2, xy); div = 2x + x = 3x
    v = lambda p: jnp.stack([p[0] ** 2, p[0] * p[1]])
    c = _coords2()
    d = calculus.divergence(v)(c)
    np.testing.assert_allclose(np.asarray(d), 3 * np.asarray(c[:, 0]),
                               rtol=1e-12)


def test_laplacian_matches_div_of_grad():
    """laplace = divergence . gradient, the identity the reference
    implements literally (utils.py:16-18); also check the closed form
    for a harmonic + non-harmonic part."""
    f = lambda p: p[0] ** 2 - p[1] ** 2 + p[0] ** 4   # lap = 12 x^2
    c = _coords2()
    lap = calculus.laplacian(f)(c)
    np.testing.assert_allclose(np.asarray(lap),
                               12 * np.asarray(c[:, 0]) ** 2, rtol=1e-12)
    grad_fn = jax.grad(f)
    div_of_grad = calculus.divergence(grad_fn)(c)
    np.testing.assert_allclose(np.asarray(lap), np.asarray(div_of_grad),
                               rtol=1e-12)


def test_param_bytes_and_estimate_size():
    from ndr_tpu import models

    cfg = models.MLPConfig(in_features=2, out_features=1, n_neurons=16,
                           n_layers=2, embedding_size=8, scale=1.0)
    params, buffers = models.init_mlp(jax.random.PRNGKey(0), cfg,
                                      jnp.float32)
    pb = memory.param_bytes(params)
    # embed(2x8 -> 16ch) -> hidden stack 16ch wide -> out 1: exact count
    n_params = sum(int(np.prod(np.shape(l)))
                   for l in jax.tree_util.tree_leaves(params))
    assert pb == 4 * n_params

    x = jnp.zeros((64, 2), jnp.float32)
    est = memory.estimate_size(
        lambda p, xx: models.mlp_apply(p, buffers, xx, cfg), params, x)
    if est:  # {} on backends without memory_analysis
        assert est["total_mb"] > 0.0
        assert est["argument_mb"] >= pb / 2 ** 20
