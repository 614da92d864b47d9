"""Disturbance engine determinism + checkpoint round-trip."""

import numpy as np
import pytest

import jax.numpy as jnp

from deep_staple_tpu.core.config import LabelDisturbanceMode, TrainConfig
from deep_staple_tpu.data.disturbance import disturb_label
from deep_staple_tpu.train.checkpoint import save_checkpoint, restore_checkpoint, checkpoint_exists
from deep_staple_tpu.train.state import create_state
from deep_staple_tpu.models import MobileNetLRASPP3D


def _blob(shape=(12, 12, 12)):
    lbl = np.zeros(shape, np.int32)
    lbl[4:8, 4:8, 4:8] = 1
    return lbl


def test_flip_roll_disturbance_deterministic_and_disruptive():
    lbl = _blob()
    a = disturb_label(lbl.copy(), LabelDisturbanceMode.FLIP_ROLL, strength=1.0, seed=7)
    b = disturb_label(lbl.copy(), LabelDisturbanceMode.FLIP_ROLL, strength=1.0, seed=7)
    c = disturb_label(lbl.copy(), LabelDisturbanceMode.FLIP_ROLL, strength=1.0, seed=8)
    np.testing.assert_array_equal(a, b)  # per-index determinism (reference :407)
    assert not np.array_equal(a, c)
    assert a.sum() == lbl.sum()  # roll preserves mass
    assert not np.array_equal(a, lbl)


def test_affine_disturbance_moves_label():
    lbl = _blob()
    a = disturb_label(lbl.copy(), LabelDisturbanceMode.AFFINE, strength=2.0, seed=3)
    b = disturb_label(lbl.copy(), LabelDisturbanceMode.AFFINE, strength=2.0, seed=3)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, lbl)
    assert set(np.unique(a)) <= {0, 1}


def test_checkpoint_roundtrip(tmp_path):
    model = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False)
    state, _ = create_state(model, (1, 16, 16, 10, 1), dataset_len=5)
    state = state.replace(
        dp_params=jnp.arange(5, dtype=jnp.float32), step=jnp.asarray(7, jnp.int32)
    )
    cfg = TrainConfig(epochs=3)
    p = tmp_path / "ckpt"
    save_checkpoint(p, state, cfg)
    assert checkpoint_exists(p)

    fresh, _ = create_state(model, (1, 16, 16, 10, 1), dataset_len=5)
    restored = restore_checkpoint(p, fresh)
    np.testing.assert_array_equal(np.asarray(restored.dp_params), np.arange(5, dtype=np.float32))
    assert int(restored.step) == 7
    import jax

    a = jnp.concatenate([x.reshape(-1) for x in jax.tree.leaves(state.params)])
    b = jnp.concatenate([x.reshape(-1) for x in jax.tree.leaves(restored.params)])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_orbax(tmp_path):
    """Orbax backend roundtrip + auto-detection on restore (checkpoint.py)."""
    model = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False)
    state, _ = create_state(model, (1, 16, 16, 10, 1), dataset_len=5)
    state = state.replace(
        dp_params=jnp.arange(5, dtype=jnp.float32), step=jnp.asarray(7, jnp.int32)
    )
    p = tmp_path / "ckpt_orbax"
    save_checkpoint(p, state, TrainConfig(epochs=3), backend="orbax")
    assert checkpoint_exists(p)
    assert (p / "state.orbax").is_dir() and not (p / "state.msgpack").exists()

    fresh, _ = create_state(model, (1, 16, 16, 10, 1), dataset_len=5)
    restored = restore_checkpoint(p, fresh)  # auto-detects orbax
    np.testing.assert_array_equal(np.asarray(restored.dp_params), np.arange(5, dtype=np.float32))
    assert int(restored.step) == 7
    import jax

    a = jnp.concatenate([x.reshape(-1) for x in jax.tree.leaves(state.params)])
    b = jnp.concatenate([x.reshape(-1) for x in jax.tree.leaves(restored.params)])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # overwrite-in-place works (save-every-N reuses the same directory)
    save_checkpoint(p, state.replace(step=jnp.asarray(9, jnp.int32)), backend="orbax")
    assert int(restore_checkpoint(p, fresh).step) == 9

    # switching backends at the same path must not leave a stale artifact
    # shadowing the fresh one (restore prefers state.orbax)
    save_checkpoint(p, state.replace(step=jnp.asarray(11, jnp.int32)), backend="msgpack")
    assert not (p / "state.orbax").exists()
    assert int(restore_checkpoint(p, fresh).step) == 11

    # crash-safety of the msgpack->orbax switch: the old msgpack must
    # survive until the orbax save LANDS — a failed collective save may not
    # leave the path with nothing restorable (checkpoint.py save ordering)
    import deep_staple_tpu.train.checkpoint as ckpt_mod

    real = ckpt_mod._orbax_checkpointer

    class _Boom:
        def save(self, *a, **kw):
            raise RuntimeError("simulated mid-save crash")

    try:
        ckpt_mod._orbax_checkpointer = lambda: (real()[0], _Boom())
        with pytest.raises(RuntimeError, match="simulated"):
            save_checkpoint(p, state, backend="orbax")
    finally:
        ckpt_mod._orbax_checkpointer = real
    assert (p / "state.msgpack").exists()
    assert int(restore_checkpoint(p, fresh).step) == 11  # still restorable
