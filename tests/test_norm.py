"""AsyncBatchNorm gates (models/norm.py).

The async (one-step-stale) BN is the fast-preset bandwidth lever: it
normalizes through the running statistics while still updating them from the
current batch. These tests pin its contract:

  * module-level semantics: eval == nn.BatchNorm eval exactly; train-mode
    running-stat update rule matches nn.BatchNorm (with first-step seeding);
    normalization uses the PRE-update stats (one-step stale);
  * model-level drop-in: param paths identical to bn_mode='batch'; the only
    batch_stats additions are 'count' scalars;
  * training viability: a short fused-step run stays finite and moves the
    loss, i.e. the stale normalization does not break optimization.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from deep_staple_tpu.models import MobileNetLRASPP3D
from deep_staple_tpu.models.norm import AsyncBatchNorm, SlabBatchNorm


def _init_pair(c=6, shape=(4, 5, 3)):
    x = jax.random.normal(jax.random.PRNGKey(0), shape + (c,), jnp.float32)
    amod = AsyncBatchNorm()
    bmod = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    av = amod.init(jax.random.PRNGKey(1), x)
    bv = bmod.init(jax.random.PRNGKey(1), x)
    return x, amod, bmod, av, bv


def test_async_bn_eval_matches_batchnorm_eval():
    x, _, _, av, bv = _init_pair()
    # Shared non-trivial params/stats.
    rng = np.random.default_rng(0)
    c = x.shape[-1]
    params = {
        "scale": jnp.asarray(rng.normal(1.0, 0.2, c), jnp.float32),
        "bias": jnp.asarray(rng.normal(0.0, 0.2, c), jnp.float32),
    }
    stats = {
        "mean": jnp.asarray(rng.normal(0.0, 1.0, c), jnp.float32),
        "var": jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32),
    }
    ya = AsyncBatchNorm(use_running_average=True).apply(
        {"params": params, "batch_stats": {**stats, "count": jnp.int32(3)}}, x
    )
    yb = nn.BatchNorm(use_running_average=True).apply(
        {"params": params, "batch_stats": stats}, x
    )
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=1e-6, atol=1e-6)


def test_async_bn_update_rule_and_staleness():
    x, amod, bmod, av, bv = _init_pair()
    x2 = jax.random.normal(jax.random.PRNGKey(2), x.shape, jnp.float32)

    # Step 1: output normalizes through the INIT stats (0, 1) -> with unit
    # scale / zero bias the output is x / sqrt(1 + eps).
    y1, s1 = amod.apply(av, x, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(x) / np.sqrt(1.0 + 1e-5), rtol=1e-5, atol=1e-6
    )
    # ... and the stats are SEEDED with the first batch's statistics.
    axes = (0, 1, 2)
    b_mean = np.asarray(jnp.mean(x, axes))
    b_var = np.asarray(jnp.mean(jnp.square(x), axes) - jnp.square(jnp.mean(x, axes)))
    np.testing.assert_allclose(np.asarray(s1["batch_stats"]["mean"]), b_mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1["batch_stats"]["var"]), b_var, rtol=1e-4, atol=1e-5)
    assert int(s1["batch_stats"]["count"]) == 1

    # Step 2: normalization uses step-1's stats (stale), update blends with
    # momentum 0.9 exactly like nn.BatchNorm.
    y2, s2 = amod.apply({"params": av["params"], **s1}, x2, mutable=["batch_stats"])
    expect_y2 = (np.asarray(x2) - b_mean) / np.sqrt(b_var + 1e-5)
    np.testing.assert_allclose(np.asarray(y2), expect_y2, rtol=1e-4, atol=1e-5)
    b2_mean = np.asarray(jnp.mean(x2, axes))
    np.testing.assert_allclose(
        np.asarray(s2["batch_stats"]["mean"]), 0.9 * b_mean + 0.1 * b2_mean,
        rtol=1e-5, atol=1e-6,
    )
    assert int(s2["batch_stats"]["count"]) == 2


def test_async_bn_stale_grads_match_running_stat_affine():
    """Backward: grads w.r.t. x are the pure affine d/dx (no batch-stat
    coupling terms), and scale/bias get the usual reductions."""
    x, amod, *_ = _init_pair(c=3, shape=(2, 4))
    av = amod.init(jax.random.PRNGKey(1), x)
    # Non-trivial running stats so mul != 1.
    stats = {
        "mean": jnp.asarray([0.3, -0.2, 0.1], jnp.float32),
        "var": jnp.asarray([1.5, 0.7, 2.0], jnp.float32),
        "count": jnp.int32(1),
    }
    scale = jnp.asarray([1.1, 0.9, 1.3], jnp.float32)
    params = {"scale": scale, "bias": jnp.zeros(3, jnp.float32)}

    def loss(p, xx):
        y = amod.apply({"params": p, "batch_stats": stats}, xx, mutable=["batch_stats"])[0]
        return jnp.sum(y * y)

    gx = jax.grad(loss, argnums=1)(params, x)
    y = amod.apply({"params": params, "batch_stats": stats}, x, mutable=["batch_stats"])[0]
    mul = np.asarray(scale) / np.sqrt(np.asarray(stats["var"]) + 1e-5)
    np.testing.assert_allclose(np.asarray(gx), 2 * np.asarray(y) * mul, rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def async_model_vars():
    x = jnp.zeros((1, 16, 16, 10, 1), jnp.float32)
    mb = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False)
    ma = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False, bn_mode="async")
    vb = mb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    va = ma.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return mb, ma, vb, va


def test_async_model_is_param_drop_in(async_model_vars):
    _, _, vb, va = async_model_vars
    paths_b = [jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(vb["params"])]
    paths_a = [jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(va["params"])]
    assert paths_b == paths_a
    kb = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(vb["batch_stats"])}
    ka = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(va["batch_stats"])}
    extra = ka - kb
    assert kb <= ka and extra and all(e.endswith("['count']") for e in extra)


def test_async_model_eval_matches_batch_model(async_model_vars):
    mb, ma, vb, va = async_model_vars
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 10, 1))
    yb = mb.apply(vb, x, train=False)["out"]
    # Transplant batch-mode params into the async model (stats identical at init).
    ya = ma.apply({"params": vb["params"], "batch_stats": va["batch_stats"]}, x, train=False)["out"]
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=1e-6, atol=1e-6)


def _toy_train(model, variables, n_steps=12):
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(2, 16, 16, 10, 1)), jnp.float32)
    lbl = (img[..., 0] > 0.5).astype(jnp.int32)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adamw(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats}, img, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(out["out"], -1)
            onehot = jax.nn.one_hot(lbl, 2)
            return -jnp.mean(jnp.sum(onehot * logp, -1)), mut["batch_stats"]

        (l, new_stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), new_stats, opt2, l

    losses = []
    for i in range(n_steps):
        params, stats, opt, l = step(params, stats, opt, jax.random.PRNGKey(i))
        losses.append(float(l))
    return losses


def test_async_model_training_recovers_from_staleness_transient(async_model_vars):
    """Known semantics: async BN has a large step-1 transient (the stale
    stats describe the step-0 regime where every BN normalized through its
    (0, 1) init — the seeded stats then amplify Adam's first full-lr jump
    through low-variance channels). Under the production optimizer family
    (AdamW) training must recover and converge; this is the documented
    tradeoff that motivates bn_mode='slab' as the stable default candidate."""
    _, ma, _, va = async_model_vars
    losses = _toy_train(ma, va)
    assert all(np.isfinite(losses[2:])), losses
    assert min(losses[-4:]) < 0.75, losses


def test_slab_model_training_is_stable():
    """bn_mode='slab' (same-batch subsampled stats) must train WITHOUT the
    async staleness blow-up: no loss above a modest bound after the first
    few steps, clean convergence."""
    x = jnp.zeros((1, 16, 16, 10, 1), jnp.float32)
    ms = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False, bn_mode="slab")
    vs = ms.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    losses = _toy_train(ms, vs)
    assert all(np.isfinite(losses)), losses
    assert max(losses[4:]) < 5.0, losses
    assert min(losses[-4:]) < 0.75, losses


def test_slab_bn_full_stats_fallback_matches_batch_stats():
    """For inputs whose D < stride (e.g. the ASPP pooled 1x1x1 branch) slab
    stats fall back to FULL batch stats: forward output equals exact
    nn.BatchNorm train-mode output."""
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 5, 4, 6), jnp.float32)
    smod = SlabBatchNorm(stride=4)  # D=2 < 4 -> full stats
    bmod = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    sv = smod.init(jax.random.PRNGKey(1), x)
    bv = bmod.init(jax.random.PRNGKey(1), x)
    ys, ss = smod.apply(sv, x, mutable=["batch_stats"])
    yb, sb = bmod.apply(bv, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yb), rtol=1e-4, atol=1e-5)


def test_slab_bn_subsample_stats_and_update_rule():
    """For D >= stride the normalization statistics are exactly the strided
    slab's mean/var, and the running-stat update seeds then momentum-blends
    like nn.BatchNorm."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 5, 4, 6), jnp.float32)
    x2 = jax.random.normal(jax.random.PRNGKey(1), x.shape, jnp.float32)
    smod = SlabBatchNorm(stride=4)
    sv = smod.init(jax.random.PRNGKey(2), x)

    xs = np.asarray(x)[:, ::4].astype(np.float64)
    m1 = xs.mean(axis=(0, 1, 2, 3))
    v1 = (xs**2).mean(axis=(0, 1, 2, 3)) - m1**2
    y1, s1 = smod.apply(sv, x, mutable=["batch_stats"])
    expect = (np.asarray(x) - m1) / np.sqrt(v1 + 1e-5)
    np.testing.assert_allclose(np.asarray(y1), expect, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1["batch_stats"]["mean"]), m1, rtol=1e-5, atol=1e-6)
    assert int(s1["batch_stats"]["count"]) == 1

    _, s2 = smod.apply({"params": sv["params"], **s1}, x2, mutable=["batch_stats"])
    xs2 = np.asarray(x2)[:, ::4].astype(np.float64)
    m2 = xs2.mean(axis=(0, 1, 2, 3))
    np.testing.assert_allclose(
        np.asarray(s2["batch_stats"]["mean"]), 0.9 * m1 + 0.1 * m2, rtol=1e-5, atol=1e-6
    )
    assert int(s2["batch_stats"]["count"]) == 2


def test_slab_bn_eval_matches_batchnorm_eval():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 5, 4, 6), jnp.float32)
    rng = np.random.default_rng(0)
    c = x.shape[-1]
    params = {
        "scale": jnp.asarray(rng.normal(1.0, 0.2, c), jnp.float32),
        "bias": jnp.asarray(rng.normal(0.0, 0.2, c), jnp.float32),
    }
    stats = {
        "mean": jnp.asarray(rng.normal(0.0, 1.0, c), jnp.float32),
        "var": jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32),
    }
    ys = SlabBatchNorm(use_running_average=True).apply(
        {"params": params, "batch_stats": {**stats, "count": jnp.int32(5)}}, x
    )
    yb = nn.BatchNorm(use_running_average=True).apply(
        {"params": params, "batch_stats": stats}, x
    )
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yb), rtol=1e-6, atol=1e-6)


def test_slab_model_is_param_drop_in():
    x = jnp.zeros((1, 16, 16, 10, 1), jnp.float32)
    mb = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False)
    ms = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False, bn_mode="slab")
    vb = mb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    vs = ms.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    pb = [jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(vb["params"])]
    ps = [jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(vs["params"])]
    assert pb == ps
    # Eval parity with transplanted params.
    xr = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 10, 1))
    yb = mb.apply(vb, xr, train=False)["out"]
    ys = ms.apply({"params": vb["params"], "batch_stats": vs["batch_stats"]}, xr, train=False)["out"]
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yb), rtol=1e-6, atol=1e-6)


def test_bn_mode_validated_at_config_construction():
    # A typo'd mode used to fall through every `== 'async'` check and
    # silently train with exact BN; now it's a construction-time error.
    import pytest

    from deep_staple_tpu.core.config import TrainConfig

    with pytest.raises(ValueError, match="bn_mode"):
        TrainConfig(bn_mode="asnyc")
    with pytest.raises(ValueError, match="bn_mode"):
        TrainConfig(bn_mode="async").replace(bn_mode="")


def test_gpipe_stages_carry_bn_mode():
    # GPipe2 must build its stages with the wrapped model's bn_mode, or the
    # pipeline silently runs exact BN while claiming to match an async model.
    from deep_staple_tpu.models import MobileNetLRASPP3D
    from deep_staple_tpu.parallel.pipeline import GPipe2

    model = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False, bn_mode="async")
    pp = GPipe2(model, lambda lo, la: 0.0, in_spatial=(8, 8, 6))
    assert pp.stage0.bn_mode == "async"
    assert pp.stage1.bn_mode == "async"
