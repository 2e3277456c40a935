"""Model-zoo semantic tests (init statistics, shapes, reference parity)."""

import numpy as np
import jax
import jax.numpy as jnp

from ndr_tpu import models
from ndr_tpu.models.cnn import (
    DeconvConfig,
    init_deconv_generator,
    deconv_generator_apply,
)


def test_mlp_shapes_and_embedding():
    cfg = models.MLPConfig(in_features=3, out_features=1, n_neurons=64,
                           n_layers=4, embedding_size=32, scale=2.5)
    params, buffers = models.init_mlp(jax.random.PRNGKey(0), cfg)
    assert buffers["B"].shape == (32, 3)
    # B scaled by sigma: std ~ sigma
    assert abs(float(jnp.std(buffers["B"])) - 2.5) < 0.5
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 7, 3))
    y = models.mlp_apply(params, buffers, x, cfg)
    assert y.shape == (10, 7, 1)
    # orthogonal init: W W^T = gain^2 I for wide layers
    W = params["layers"][1]["w"]
    gain2 = max(64 / 32, 1)
    np.testing.assert_allclose(
        np.asarray(W @ W.T), gain2 * np.eye(W.shape[0]), atol=1e-4
    )


def test_homogeneous_init_gives_uniform_field():
    cfg = models.MLPConfig(in_features=3, n_neurons=32, n_layers=3,
                           embedding_size=16, scale=1.0)
    params, buffers = models.init_mlp(jax.random.PRNGKey(0), cfg)
    params = models.homogeneous_init(params, 0.3)
    x = jax.random.uniform(jax.random.PRNGKey(2), (50, 3))
    y = models.mlp_apply(params, buffers, x, cfg)
    np.testing.assert_allclose(np.asarray(y), 0.3, atol=1e-2)


def test_multihead_scale_change():
    cfg = models.MLPConfig(in_features=2, n_neurons=32, n_layers=3, embedding_size=16)
    params, buffers = models.init_multihead_mlp(jax.random.PRNGKey(0), cfg, n_heads=3)
    B0 = np.asarray(buffers["B"])
    buffers = models.change_scale_value(buffers, 4.0)
    np.testing.assert_allclose(np.asarray(buffers["B"]), 4.0 * B0, rtol=1e-6)
    buffers = models.change_scale_value(buffers, 2.0)
    np.testing.assert_allclose(np.asarray(buffers["B"]), 2.0 * B0, rtol=1e-6)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 2))
    y0 = models.multihead_apply(params, buffers, x, 0, cfg)
    y1 = models.multihead_apply(params, buffers, x, 1, cfg)
    assert y0.shape == (5, 1) and not np.allclose(np.asarray(y0), np.asarray(y1))


def test_siren_shapes():
    cfg = models.SirenConfig(in_features=2, hidden_features=32, hidden_layers=2)
    params = models.init_siren(jax.random.PRNGKey(0), cfg)
    y = models.siren_apply(params, jax.random.normal(jax.random.PRNGKey(1), (11, 2)), cfg)
    assert y.shape == (11, 1)
    # first-layer weights within U(-1/in, 1/in)
    W0 = np.asarray(params["layers"][0]["w"])
    assert np.abs(W0).max() <= 0.5 + 1e-6


def test_cnn_generates_grid():
    cfg = models.CNNConfig(grid_dims=(40, 16), latent_size=16, dense_channels=8,
                           resizes=(1, 2, 2, 2, 1), conv_filters=(16, 8, 8, 4, 1))
    params = models.init_cnn(jax.random.PRNGKey(0), cfg)
    out = models.cnn_apply(params, cfg)
    assert out.shape == (40, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_deconv_generator_shape():
    cfg = DeconvConfig(in_features=1, design=(40, 20))
    params = init_deconv_generator(jax.random.PRNGKey(0), cfg)
    latent = (cfg.design[0] // 4) * (cfg.design[1] // 4)
    z = jax.random.normal(jax.random.PRNGKey(1), (latent, 1)) * 0.1
    out = deconv_generator_apply(params, cfg, z)
    assert out.shape == cfg.design
    assert np.isfinite(np.asarray(out)).all()


def test_mlp_chunked_apply_matches_full():
    """mlp_apply_chunked (memory-bounded lax.map + remat) must agree with
    the full-batch forward in both values and parameter gradients."""
    cfg = models.MLPConfig(in_features=3, out_features=1, n_neurons=16,
                           n_layers=2, embedding_size=8, scale=1.0)
    params, buffers = models.init_mlp(jax.random.PRNGKey(0), cfg, jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (11, 9, 3))
    a = models.mlp_apply(params, buffers, x, cfg)
    b = models.mlp_apply_chunked(params, buffers, x, cfg, max_points=16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    ga = jax.grad(lambda p: jnp.sum(models.mlp_apply(p, buffers, x, cfg) ** 2))(params)
    gb = jax.grad(lambda p: jnp.sum(
        models.mlp_apply_chunked(p, buffers, x, cfg, max_points=16) ** 2))(params)
    for la, lb in zip(ga["layers"], gb["layers"]):
        np.testing.assert_allclose(np.asarray(la["w"]), np.asarray(lb["w"]),
                                   rtol=2e-5, atol=1e-7)


def test_mlp_matmul_precision_knob():
    """The hidden-layer precision knob must (a) wire through, (b) leave
    the Fourier encoding at high precision, and (c) keep the fast-path
    output close to the high-precision one (bf16 hidden matmuls round the
    activations, not the encoding)."""
    cfg_hi = models.MLPConfig(in_features=3, out_features=1, n_neurons=64,
                              n_layers=3, embedding_size=32, scale=2.0,
                              matmul_precision="highest")
    cfg_fast = models.MLPConfig(in_features=3, out_features=1, n_neurons=64,
                                n_layers=3, embedding_size=32, scale=2.0,
                                matmul_precision="default")
    params, buffers = models.init_mlp(jax.random.PRNGKey(0), cfg_hi)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    y_hi = models.mlp_apply(params, buffers, x, cfg_hi)
    y_fast = models.mlp_apply(params, buffers, x, cfg_fast)
    # on CPU precision flags are no-ops (all f32); on TPU "default" is
    # 1-pass bf16 — either way the fields must agree to bf16-level error
    scale = float(jnp.max(jnp.abs(y_hi))) + 1e-6
    assert float(jnp.max(jnp.abs(y_hi - y_fast))) / scale < 0.05
