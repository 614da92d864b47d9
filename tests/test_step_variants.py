"""Train-step config variants: MIND features, non-OOL DP, DP disabled,
frozen (override) embeddings, fused vs strict OOL."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_staple_tpu.core.config import TrainConfig, DataParamMode
from deep_staple_tpu.train.driver import make_model
from deep_staple_tpu.train.state import create_state
from deep_staple_tpu.train.step import make_train_step, resolve_augment_order


def _run_step(config, in_ch=1, base=(12, 12, 8), B=2, n=8):
    model, ch = make_model(config, 2)
    assert ch == in_ch
    aug = tuple(int(s * 1.5) for s in base)
    state, tx = create_state(model, (1,) + aug + (ch,), n)
    cw = np.array([0.5, 1.5], np.float32)
    fw = np.full((n,), 5.0, np.float32)
    step = make_train_step(model, tx, config, cw, fw, pre_interpolation_factor=1.5)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(B, *base).astype(np.float32)),
        "label": jnp.asarray((rng.rand(B, *base) > 0.8).astype(np.int32)),
        "modified_label": jnp.asarray((rng.rand(B, *base) > 0.8).astype(np.int32)),
        "dataset_idx": jnp.arange(B, dtype=jnp.int32),
    }
    new_state, metrics = step(state, batch, 0.01, jax.random.PRNGKey(0))
    return state, new_state, metrics


def test_mind_step():
    config = TrainConfig(use_mind=True, use_checkpointing=False, ool_mode="fused")
    _, new_state, metrics = _run_step(config, in_ch=12)
    assert np.isfinite(float(metrics["loss"]))


def test_non_ool_updates_model_from_dp_loss():
    config = TrainConfig(use_ool_dp_loss=False, use_checkpointing=False)
    state, new_state, metrics = _run_step(config)
    assert "dp_loss" in metrics
    # model params moved (dp_loss backprops into the model, reference :769-773)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # dp params moved too
    assert np.any(np.asarray(new_state.dp_params) != 0)


def test_dp_disabled_mode():
    config = TrainConfig(data_param_mode=DataParamMode.DISABLED, use_checkpointing=False)
    model, _ = make_model(config, 2)
    base = (12, 12, 8)
    aug = tuple(int(s * 1.5) for s in base)
    state, tx = create_state(model, (1,) + aug + (1,), 8, use_data_params=False)
    assert state.dp_params is None
    cw = np.array([0.5, 1.5], np.float32)
    fw = np.full((8,), 5.0, np.float32)
    step = make_train_step(model, tx, config, cw, fw, pre_interpolation_factor=1.5)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(2, *base).astype(np.float32)),
        "label": jnp.asarray((rng.rand(2, *base) > 0.8).astype(np.int32)),
        "modified_label": jnp.asarray((rng.rand(2, *base) > 0.8).astype(np.int32)),
        "dataset_idx": jnp.arange(2, dtype=jnp.int32),
    }
    new_state, metrics = step(state, batch, 0.01, jax.random.PRNGKey(0))
    assert "dp_loss" not in metrics
    assert float(metrics["loss"]) == float(metrics["ce_loss"])


def test_resolve_augment_order_int6_downgrade():
    # '-int6' packs labels as 2-bit codes -> binary only; anything else
    # downgrades to the matching '-int8' order (driver applies this before
    # building the step, so `--preset production` works on any dataset).
    assert resolve_augment_order("fast-int6", 2) == "fast-int6"
    assert resolve_augment_order("fast-int6", 3) == "fast-int8"
    assert resolve_augment_order("reference-int6", 5) == "reference-int8"
    assert resolve_augment_order("fast-int8", 3) == "fast-int8"
    assert resolve_augment_order("reference", 3) == "reference"
    # '-sep' packs labels the same way -> binary only, same downgrade
    assert resolve_augment_order("fast-sep", 2) == "fast-sep"
    assert resolve_augment_order("fast-sep", 3) == "fast-int8"
    # production preset is fast-sep; make_train_step itself still guards
    # direct use with non-binary class counts
    assert TrainConfig.tpu_production().augment_order == "fast-sep"
    config = TrainConfig.tpu_production(use_checkpointing=False)
    model, _ = make_model(config, 3)
    state, tx = create_state(model, (1, 18, 18, 12, 1), 8)
    cw = np.array([0.5, 1.0, 1.5], np.float32)
    fw = np.full((8,), 5.0, np.float32)
    with pytest.raises(ValueError, match="binary labels"):
        make_train_step(model, tx, config, cw, fw, pre_interpolation_factor=1.5)


def test_override_embedding_weights_freezes_dp():
    config = TrainConfig(override_embedding_weights=True, use_checkpointing=False, ool_mode="fused")
    state, new_state, _ = _run_step(config)
    np.testing.assert_array_equal(np.asarray(state.dp_params), np.asarray(new_state.dp_params))
