"""IO round-trip tests: msh/vtr writers (Python + native), checkpoints."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ndr_tpu.grid import make_grid
from ndr_tpu.io import export, native


def test_msh_roundtrip_python(tmp_path):
    grid = make_grid((4, 3), [[0, 0], [2, 1]])
    rng = np.random.default_rng(0)
    field = rng.uniform(size=grid.dims)
    path = str(tmp_path / "mesh.msh")
    export.write_msh(path, grid, {"density": field})
    back = export.read_msh_element_field(path, "density")
    np.testing.assert_allclose(back.reshape(grid.dims), field, rtol=1e-12)


@pytest.mark.parametrize("dims", [(4, 3), (3, 2, 2)])
def test_msh_roundtrip_native(tmp_path, dims):
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    grid = make_grid(dims)
    rng = np.random.default_rng(1)
    field = rng.uniform(size=grid.dims)
    path = str(tmp_path / "mesh_native.msh")
    assert native.write_msh(path, grid, field)
    back = native.read_msh_field(path, "density", grid.num_elements)
    np.testing.assert_allclose(back.reshape(grid.dims), field, rtol=1e-12)
    # and the Python parser must read the native binary file too? (binary
    # not supported by the python reader; the native reader handles both)
    back2 = native.read_msh_field(path, "density", grid.num_elements)
    np.testing.assert_allclose(back2, back)


def test_vtr_writers_produce_valid_headers(tmp_path):
    grid = make_grid((4, 3, 2))
    field = np.random.default_rng(2).uniform(size=grid.dims)
    p1 = export.write_vtr(str(tmp_path / "py"), {"density": field})
    assert open(p1).read(22).startswith("<?xml")
    if native.get_lib() is not None:
        p2 = str(tmp_path / "nat.vtr")
        assert native.write_vtr(p2, field, name="density")
        head = open(p2, "rb").read(200).decode(errors="ignore")
        assert "RectilinearGrid" in head


def test_ct_loader(tmp_path):
    """16-bit big-endian slices load scaled to [0,1] in (h, w, n) layout."""
    rng = np.random.default_rng(3)
    h, w, n = 6, 5, 4
    vols = []
    for s in range(n):
        data = rng.integers(0, 65535, size=(h, w), dtype=np.uint16)
        vols.append(data.astype(np.float32) / 65535.0)
        with open(tmp_path / f"slice_{s:03d}.raw", "wb") as f:
            f.write(data.astype(">u2").tobytes())
    vol = native.load_ct(str(tmp_path), (h, w))
    assert vol.shape == (h, w, n)
    np.testing.assert_allclose(vol, np.stack(vols, axis=-1), atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from ndr_tpu import models
    from ndr_tpu.utils import checkpoint as ckpt

    cfg = models.MLPConfig(in_features=2, n_neurons=16, n_layers=2,
                           embedding_size=8, scale=2.0)
    params, buffers = models.init_mlp(jax.random.PRNGKey(0), cfg)
    import optax
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    path = str(tmp_path / "ck.npz")
    ckpt.save_checkpoint(path, params, buffers, scale=2.0, step=7,
                         opt_state=opt_state)
    p2, b2, scale, step, o2 = ckpt.load_checkpoint(path, params, buffers, opt_state)
    assert scale == 2.0 and step == 7
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(buffers["B"]), np.asarray(b2["B"]))
    assert o2 is not None


def test_checkpoint_validates_structure_and_shapes(tmp_path):
    """Format-2 checkpoints store leaves by pytree key path and reject
    template mismatches loudly (round-1 positional format silently
    misassigned weights on structural change)."""
    import optax

    from ndr_tpu import models
    from ndr_tpu.utils import checkpoint as ckpt

    cfg = models.MLPConfig(in_features=2, n_neurons=8, n_layers=2,
                           embedding_size=4, scale=1.5)
    params, buffers = models.init_mlp(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    path = str(tmp_path / "ck.npz")
    ckpt.save_checkpoint(path, params, buffers, 1.5, step=7,
                         opt_state=opt.init(params))
    p2, b2, s, step, o2 = ckpt.load_checkpoint(path, params, buffers,
                                               opt.init(params))
    assert (s, step) == (1.5, 7) and o2 is not None
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cfg3 = models.MLPConfig(in_features=2, n_neurons=8, n_layers=3,
                            embedding_size=4)
    p3, b3 = models.init_mlp(jax.random.PRNGKey(1), cfg3)
    with pytest.raises(ValueError, match="structure mismatch"):
        ckpt.load_checkpoint(path, p3, b3, None)

    cfg4 = models.MLPConfig(in_features=2, n_neurons=16, n_layers=2,
                            embedding_size=4)
    p4, b4 = models.init_mlp(jax.random.PRNGKey(1), cfg4)
    with pytest.raises(ValueError, match="shape"):
        ckpt.load_checkpoint(path, p4, b4, None)


def test_async_checkpoint_roundtrip(tmp_path):
    """save_checkpoint_async + wait_checkpoints writes the same validated
    .npz as the synchronous path, atomically (no .tmp left behind)."""
    from ndr_tpu import models
    from ndr_tpu.utils import checkpoint as ckpt

    cfg = models.MLPConfig(in_features=2, n_neurons=8, n_layers=2,
                           embedding_size=4, scale=1.5)
    params, buffers = models.init_mlp(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "ck_async.npz")
    ckpt.save_checkpoint_async(path, params, buffers, scale=1.5, step=3)
    # a second save must serialize behind the first (ordered writes)
    ckpt.save_checkpoint_async(path, params, buffers, scale=1.5, step=4)
    ckpt.wait_checkpoints()
    assert not os.path.exists(path + ".tmp")
    p2, b2, s, step, _ = ckpt.load_checkpoint(path, params, buffers)
    assert (s, step) == (1.5, 4)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
