"""Multi-chip paths on the virtual 8-device CPU mesh: data-parallel train step
equivalence and spatially-sharded whole-volume inference correctness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from deep_staple_tpu.core.config import TrainConfig
from deep_staple_tpu.models import MobileNetLRASPP3D
from deep_staple_tpu.parallel.mesh import make_mesh, shard_batch, replicate_state
from deep_staple_tpu.parallel.spatial import make_whole_volume_inference
from deep_staple_tpu.train.driver import make_model
from deep_staple_tpu.train.state import create_state
from deep_staple_tpu.train.step import make_train_step


@pytest.fixture(scope="module")
def tiny_setup():
    # fused OOL: dp_loss is computed from the pre-update logits, so it is a
    # deterministic pre-update scalar comparable across shardings (strict mode
    # evaluates dp_loss on post-AdamW params, which are sign-amplified).
    config = TrainConfig(use_checkpointing=False, ool_mode="fused")
    model, _ = make_model(config, 2)
    B, base = 8, (16, 16, 12)
    aug = tuple(int(s * 1.5) for s in base)
    n = 32
    state, tx = create_state(model, (1,) + aug + (1,), n)
    cw = np.array([0.5, 1.5], np.float32)
    fw = np.full((n,), 5.0, np.float32)
    step = make_train_step(model, tx, config, cw, fw, pre_interpolation_factor=1.5)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randn(B, *base).astype(np.float32),
        "label": (rng.rand(B, *base) > 0.8).astype(np.int32),
        "modified_label": (rng.rand(B, *base) > 0.8).astype(np.int32),
        "dataset_idx": np.arange(B, dtype=np.int32),
    }
    return model, state, step, batch


def test_data_parallel_step_matches_single_device(tiny_setup):
    """Sharded-vs-unsharded equivalence of the *compute graph*.

    Pre-update quantities (CE loss, per-sample dice) must match tightly.
    Post-update params are NOT compared: AdamW's first step is ~lr*sign(g),
    which amplifies 1e-7 reduction-order differences into sign flips — an
    inherent property of the optimizer, not a sharding bug.
    """
    model, state, step, batch_np = tiny_setup
    key = jax.random.PRNGKey(0)

    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    s1, m1 = step(state, batch1, 0.01, key)

    mesh = make_mesh(data=8, space=1)
    with mesh:
        state8 = replicate_state(state, mesh)
        batch8 = shard_batch(batch_np, mesh)
        s8, m8 = step(state8, batch8, 0.01, key)

    np.testing.assert_allclose(
        np.asarray(m1["ce_loss"]), np.asarray(m8["ce_loss"]), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m1["dp_loss"]), np.asarray(m8["dp_loss"]), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m1["dice"]), np.asarray(m8["dice"]), rtol=1e-5, atol=1e-6, equal_nan=True
    )
    # DP rows touched by the batch moved; untouched rows did not.
    dp1 = np.asarray(s1.dp_params)
    dp8 = np.asarray(s8.dp_params)
    B = batch_np["image"].shape[0]
    assert np.all(dp1[B:] == 0) and np.all(dp8[B:] == 0)
    assert np.all(dp1[:B] != 0) and np.all(dp8[:B] != 0)


def test_spatially_sharded_inference_matches_unsharded():
    model = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 12))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x[..., None], train=False)

    want = np.asarray(jnp.argmax(model.apply(variables, x[..., None], train=False)["out"], -1))

    mesh = make_mesh(data=1, space=8)
    infer = make_whole_volume_inference(model, mesh)
    got = np.asarray(infer(variables, x))
    np.testing.assert_array_equal(got, want)


def test_dryrun_multichip_self_bootstraps_from_initialized_jax():
    """Regression gate for the driver artifact: dryrun_multichip must work
    even when jax is already imported/initialized in this process (as under
    the axon sitecustomize) by re-execing into a clean virtual-CPU child."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    assert "jax" in sys.modules  # precondition: the hostile case
    g.dryrun_multichip(2)  # raises on child failure
