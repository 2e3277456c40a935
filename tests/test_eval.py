"""Resolution-transfer evaluation tests (reference: eval/ scripts)."""

import numpy as np
import jax
import jax.numpy as jnp

from ndr_tpu import models
from ndr_tpu.eval.evaluate import (
    evaluate_density,
    evaluate_model_at_resolution,
    upsample_density,
)
from ndr_tpu.io.problem import load_problem


def test_evaluate_density_and_binary():
    cfg = load_problem("problems/2d/mbb_beam.json")
    rng = np.random.default_rng(0)
    density = np.clip(rng.uniform(0.2, 0.8, size=(16, 8)), 0, 1)
    res = evaluate_density(cfg, density, multigrid_levels=1, tol=1e-7)
    assert res.compliance > 0 and res.binary_compliance > 0
    assert 0 <= res.binary_volume <= 1


def test_model_resolution_transfer():
    """Query the same network at two resolutions: compliance is finite and
    the coarse/fine fields agree in volume (the mesh-independence check,
    reference: eval_fourfeat.py:100-133)."""
    cfg = load_problem("problems/2d/mbb_beam.json")
    mlp_cfg = models.MLPConfig(in_features=2, n_neurons=16, n_layers=2,
                               embedding_size=8, scale=1.0)
    params, buffers = models.init_mlp(jax.random.PRNGKey(0), mlp_cfg)
    params = models.homogeneous_init(params, cfg.max_volume)
    r1 = evaluate_model_at_resolution(cfg, params, buffers, mlp_cfg, (12, 4),
                                      multigrid_levels=1, tol=1e-6)
    r2 = evaluate_model_at_resolution(cfg, params, buffers, mlp_cfg, (24, 8),
                                      multigrid_levels=1, tol=1e-6)
    # hard satisfier pins the volume at both resolutions
    assert abs(np.mean(r1.density) - cfg.max_volume) < 1e-5
    assert abs(np.mean(r2.density) - cfg.max_volume) < 1e-5
    assert np.isfinite(r1.compliance) and np.isfinite(r2.compliance)


def test_upsample_density_preserves_mean():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(8, 6)))
    up = upsample_density(x, (16, 12))
    assert up.shape == (16, 12)
    assert abs(float(jnp.mean(up)) - float(jnp.mean(x))) < 0.05
