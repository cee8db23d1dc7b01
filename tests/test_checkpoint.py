"""Checkpoint round-trips: flax msgpack inference weights and orbax train
state."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pc_accumulation_lib_tpu.models import checkpoint as ckpt
from pc_accumulation_lib_tpu.models import train as train_mod
from pc_accumulation_lib_tpu.models.semseg import SemSegTPU, load_semseg_model


def test_semseg_weights_roundtrip(tmp_path, rng):
    m = SemSegTPU(seed=0, stage_sizes=(1, 1, 1, 1))
    path = str(tmp_path / 'weights.msgpack')
    ckpt.save_semseg_weights(m, path)
    m2 = SemSegTPU(seed=1, stage_sizes=(1, 1, 1, 1))
    import flax.serialization as ser
    with open(path, 'rb') as f:
        m2.variables = ser.from_bytes(m2.variables, f.read())
    img = rng.integers(0, 256, size=(32, 64, 3)).astype(np.uint8)
    np.testing.assert_array_equal(m(img), m2(img))


def test_train_state_roundtrip(tmp_path, rng):
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ('data', 'model'))
    hw = (32, 64)
    state, step = train_mod.make_train_setup(mesh, img_hw=hw,
                                             stage_sizes=(1, 1, 1, 1))
    images = jnp.asarray(rng.integers(0, 256, size=(4, *hw, 3)),
                         jnp.float32)
    labels = jnp.asarray(rng.integers(0, 19, size=(4, *hw)), jnp.int32)
    state, _ = step(state, images, labels)
    ckpt_dir = str(tmp_path / 'ckpt')
    try:
        ckpt.save_train_state(ckpt_dir, int(state.step), state)
    except (ImportError, ValueError) as e:
        pytest.skip(f'orbax unavailable/incompatible: {e}')
    restored = ckpt.restore_train_state(ckpt_dir, state)
    assert int(restored.step) == int(state.step)
    a = jax.tree_util.tree_leaves(state.variables['params'])[0]
    b = jax.tree_util.tree_leaves(restored.variables['params'])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # Training continues from the restored state.
    restored, loss = step(restored, images, labels)
    assert np.isfinite(float(loss))
