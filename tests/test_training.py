"""End-to-end training loop tests (neural TO, multires, classic pipeline)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ndr_tpu.io.problem import load_problem
from ndr_tpu.training import curriculum, neural
from ndr_tpu.training.classic import ground_truth_topopt


def _tiny_ncfg(**kw):
    defaults = dict(
        embedding_size=32, n_neurons=32, n_layers=3, sigma=1.5,
        learning_rate=3e-3, volume_constraint_satisfier="constrained_sigmoid",
        multigrid_levels=1, cg_tol=1e-5,
    )
    defaults.update(kw)
    return neural.NeuralTOConfig(**defaults)


def test_neural_to_single_resolution_decreases_compliance():
    cfg = load_problem("problems/2d/mbb_beam.json")
    state, hist, aux = neural.train(
        cfg, _tiny_ncfg(), dims=(16, 8), max_iter=25, log=lambda s: None,
    )
    assert hist[-1] < hist[0]
    # hard satisfier keeps the volume at the target
    rho = aux["density_fn"](
        state.params, state.buffers, aux["coords"],
        jnp.asarray(cfg.max_volume, jnp.float32),
    )
    assert abs(float(jnp.mean(rho)) - cfg.max_volume) < 1e-5


def test_neural_to_soft_mode_runs():
    cfg = load_problem("problems/2d/mbb_beam.json")
    state, hist, aux = neural.train(
        cfg, _tiny_ncfg(volume_constraint_satisfier="maxed_barrier"),
        dims=(12, 4), max_iter=10, log=lambda s: None,
    )
    assert np.isfinite(hist).all()


def test_multires_curriculum():
    """Resolution schedule: same model re-trained on growing grids
    (reference: train_xdg.py per-resolution loop)."""
    cfg = load_problem("problems/2d/mbb_beam.json")
    res = curriculum.prepare_resolutions(interval=4, start=0, end=2, order="ctf")
    epochs = curriculum.prepare_epoch_sizes(len(res), mode="constant",
                                            constant_value=10)
    state, hist, aux = neural.train_multires(
        cfg, _tiny_ncfg(), (12, 4), res, epochs, log=lambda s: None,
    )
    assert len(hist) == 10 * len(res)
    assert hist[-1] < hist[0]


def test_curriculum_schedules_match_reference_semantics():
    res = curriculum.prepare_resolutions(interval=5, start=0, end=3, order="ctf")
    np.testing.assert_array_equal(res, [0, 5, 10, 10])  # final repeated
    res = curriculum.prepare_resolutions(interval=5, start=0, end=3, order="ftc")
    np.testing.assert_array_equal(res, [0, -5, -10, 0])
    sizes = curriculum.prepare_epoch_sizes(4, 100, 400, mode="linear_inc")
    assert sizes == [100, 200, 300, 400]
    tasks = curriculum.prepare_task_values(2, 0, 4, order="ctf")
    np.testing.assert_array_equal(tasks, [0, 2, 4, 6])


def test_forget_weights_and_activation_masks():
    from ndr_tpu import models

    cfg = models.MLPConfig(in_features=2, n_neurons=32, n_layers=3,
                           embedding_size=16)
    params, buffers = models.init_mlp(jax.random.PRNGKey(0), cfg)
    forgotten = curriculum.forget_weights(
        jax.random.PRNGKey(1), params, rate=0.5, mode="normal",
        n_neurons=32, embedding_size=16,
    )
    w0 = np.asarray(params["layers"][0]["w"])
    w1 = np.asarray(forgotten["layers"][0]["w"])
    frac_changed = np.mean(w0 != w1)
    assert 0.2 < frac_changed < 0.8  # ~rate of entries re-initialized

    masks = curriculum.make_activation_masks(jax.random.PRNGKey(2), params, rate=0.5)
    assert len(masks) == 2
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 2))
    y_masked = models.mlp_apply(params, buffers, x, cfg, activation_masks=masks)
    y_plain = models.mlp_apply(params, buffers, x, cfg)
    assert not np.allclose(np.asarray(y_masked), np.asarray(y_plain))


def test_classic_pipeline_plain_cg_path():
    """ground_truth_topopt with use_multigrid=False (ComplianceObjective
    equivalent, reference: fem.py:44-45)."""
    cfg = load_problem("problems/2d/mbb_beam.json")
    result = ground_truth_topopt(
        cfg, dims=(16, 8), max_iter=8, use_multigrid=False, tol=1e-8,
        log=lambda s: None,
    )
    assert result.history[-1] < result.history[0]
    assert result.binary_compliance > 0
