"""Model gates: parameter-count parity with the reference (1,228,932 at
in=1/classes=2, `main_deep_staple.py:404` print) and forward shape contracts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_staple_tpu.models import MobileNetLRASPP3D, LRASPPMobileNetV3Large2D


def _param_count(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def model_and_vars():
    model = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False)
    x = jnp.zeros((1, 16, 16, 10, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return model, variables


def test_param_count_matches_reference(model_and_vars):
    _, variables = model_and_vars
    assert _param_count(variables["params"]) == 1_228_932


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((2, 16, 16, 10, 1), jnp.float32)
    out = model.apply(variables, x, train=False)["out"]
    assert out.shape == (2, 16, 16, 10, 2)
    assert out.dtype == jnp.float32


def test_train_mode_updates_batch_stats(model_and_vars):
    model, variables = model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 10, 1))
    out, mutated = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert out["out"].shape == (1, 16, 16, 10, 2)
    # Running stats must actually move.
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_remat_variant_matches_non_remat(model_and_vars):
    model, variables = model_and_vars
    remat_model = MobileNetLRASPP3D(num_classes=2, use_checkpointing=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 10, 1))
    a = model.apply(variables, x, train=False)["out"]
    b = remat_model.apply(variables, x, train=False)["out"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_2d_model_forward():
    model = LRASPPMobileNetV3Large2D(num_classes=2)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)["out"]
    assert out.shape == (1, 32, 32, 2)


@pytest.mark.parametrize("impl", ["shift", "hybrid", "pallas"])
def test_depthwise_shift_impl_matches_xla_grouped_conv(impl):
    """The shifted-FMA depthwise conv (ops/conv3d.py) must equal XLA's grouped
    conv: same param tree, same outputs, same grads, covering stride 1 and the
    backbone's stride-2 block (block 6) plus odd spatial dims. 'hybrid' mixes
    shift (stride-1) with xla (stride-2) and must still share the param tree."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 9, 8, 1))
    m_shift = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False, depthwise_impl=impl)
    m_xla = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False, depthwise_impl="xla")
    v = m_shift.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    v2 = m_xla.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    out_s = m_shift.apply(v, x, train=False)["out"]
    out_x = m_xla.apply(v, x, train=False)["out"]
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_x), rtol=1e-5, atol=1e-5)

    def loss(variables, model):
        return jnp.sum(model.apply(variables, x, train=False)["out"] ** 2)

    g_s = jax.grad(loss)(v, m_shift)["params"]
    g_x = jax.grad(loss)(v, m_xla)["params"]
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_depthwise_impl_auto_resolution():
    """'auto' (the default) must resolve per backend at trace time: 'shift'
    on CPU (XLA-CPU grouped conv is ~0.08 GFLOP/s — this is what keeps the
    suite tractable), 'xla' on accelerators (measured fastest on v5e).
    Explicit impls pass through untouched."""
    from deep_staple_tpu.models.lraspp3d import resolve_depthwise_impl

    assert resolve_depthwise_impl("auto") == "shift"  # suite runs on CPU
    for impl in ("xla", "shift", "hybrid", "pallas"):
        assert resolve_depthwise_impl(impl) == impl
    # The default model on CPU must produce the shift param layout (same tree
    # as explicit 'shift' — gate-tested equal to 'xla' above) and the module
    # default must be 'auto' so the TPU production path stays on 'xla'.
    assert MobileNetLRASPP3D(num_classes=2).depthwise_impl == "auto"


@pytest.mark.parametrize("stride,dims", [(1, (7, 6, 5)), (2, (8, 7, 6)), (2, (9, 9, 9))])
def test_depthwise_conv3d_custom_vjp_matches_xla(stride, dims):
    """Op-level gate for the hand-written VJP of `depthwise_conv3d_shifted`
    (ops/conv3d.py): grad_x and grad_w must match XLA's grouped-conv autodiff
    for stride 1 and 2, odd and even extents (the dilated-cotangent edge
    cases)."""
    import jax.lax as lax

    from deep_staple_tpu.ops.conv3d import depthwise_conv3d_shifted

    C = 4
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    x = jax.random.normal(k1, (2, *dims, C))
    w = jax.random.normal(k2, (3, 3, 3, 1, C))
    g_seed = jax.random.normal(k3, (1,))  # fixed scalar to mix the output

    def xla_ref(x, w):
        return lax.conv_general_dilated(
            x, w, window_strides=(stride,) * 3, padding=[(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=C,
        )

    out_s = depthwise_conv3d_shifted(x, w, stride)
    out_x = xla_ref(x, w)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_x), rtol=1e-5, atol=1e-5)

    def loss(fn):
        def inner(x, w):
            y = fn(x, w)
            return jnp.sum(y * jnp.sin(g_seed[0] + y))  # non-uniform cotangent
        return inner

    gx_s, gw_s = jax.grad(loss(lambda a, b: depthwise_conv3d_shifted(a, b, stride)), argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(loss(xla_ref), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_x), rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_x), rtol=5e-3, atol=1e-4)


@pytest.mark.parametrize("shape,C", [((2, 7, 5, 4), 5), ((1, 8, 6, 5), 130)])
def test_depthwise_conv3d_pallas_edge_shapes(shape, C):
    """Direct gate for ops/conv3d_pallas.py edge cases: prime D (z-tile
    fallback TZ=1) and C>128 (multi-lane-tile channel grid)."""
    import jax.lax as lax

    from deep_staple_tpu.ops.conv3d_pallas import depthwise_conv3d_pallas

    B, D, H, W = shape
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    x = jax.random.normal(k1, (B, D, H, W, C))
    w = jax.random.normal(k2, (3, 3, 3, 1, C))

    def xla_ref(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=C,
        )

    np.testing.assert_allclose(
        np.asarray(depthwise_conv3d_pallas(x, w)), np.asarray(xla_ref(x, w)),
        rtol=1e-5, atol=1e-5,
    )

    def loss(f):
        return lambda x, w: jnp.sum(jnp.sin(f(x, w)))

    gx_p, gw_p = jax.grad(loss(depthwise_conv3d_pallas), argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(loss(xla_ref), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x), rtol=1e-4, atol=1e-4)


def test_depthwise_conv3d_custom_vjp_bf16_grad_w_accumulates_f32():
    """bf16 inputs: grad_w must match the XLA grouped conv (which accumulates
    in f32) — guards the f32 accumulation in ops/conv3d.py's hand VJP; a bf16
    reduction over ~10k terms would lose the mantissa entirely."""
    import jax.lax as lax

    from deep_staple_tpu.ops.conv3d import depthwise_conv3d_shifted

    C = 3
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    x = jax.random.normal(k1, (2, 16, 16, 16, C)).astype(jnp.bfloat16)
    w = jax.random.normal(k2, (3, 3, 3, 1, C)).astype(jnp.bfloat16)

    def xla_ref(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=C,
        )

    def loss(f):
        return lambda x, w: jnp.sum(f(x, w).astype(jnp.float32))

    gw_s = jax.grad(loss(lambda a, b: depthwise_conv3d_shifted(a, b, 1)), argnums=1)(x, w)
    gw_x = jax.grad(loss(xla_ref), argnums=1)(x, w)
    # products are bf16 but the accumulation is f32 on both sides: the sums
    # over ~8k terms agree to product-rounding noise, not sqrt(n)*bf16-eps
    np.testing.assert_allclose(
        np.asarray(gw_s, np.float32), np.asarray(gw_x, np.float32), rtol=2e-2, atol=2e-1
    )


def test_aspp_conv_head_variant():
    """MobileNetASPP3D (reference MobileNet_ASPP_3D :160-257): plain conv
    head on the ASPP output instead of the LR-ASPP low/high fusion —
    forward shape contract and trainability."""
    from deep_staple_tpu.models import MobileNetASPP3D

    model = MobileNetASPP3D(num_classes=2, use_checkpointing=False)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 10, 1))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(v, x, train=False)["out"]
    assert out.shape == (1, 16, 16, 10, 2)
    # no LR-ASPP head params; the conv head consumes the ASPP output
    names = " ".join(jax.tree_util.tree_structure(v["params"]).__repr__().split())
    assert "LRASPPHead3D" not in names and ("ConvHead3D" in names or "head" in names)

    def loss(params):
        return jnp.sum(model.apply({**v, "params": params}, x, train=False)["out"] ** 2)

    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(g))


def test_pointwise_matmul_matches_conv():
    """The explicit-dot pointwise conv (_PointwiseConv3D) must be a drop-in
    for the XLA conv emitter: identical param tree, outputs, and grads across
    the full model (it replaces every 1x1x1 stride-1 ungrouped conv).

    The toggle is the module-level POINTWISE_MATMUL_DEFAULT, consulted at
    trace time — a ConvBN *class attribute* assignment would be a silent
    no-op (dataclass __init__ defaults freeze at class creation; the round-3
    A/B was vacuous until this was caught). The sanity check below proves the
    toggle actually switches the implementation."""
    from deep_staple_tpu.models import lraspp3d

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 10, 8, 1))
    m = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False, dropout_rate=0.0)

    def trees_and_loss(enabled):
        old = lraspp3d.POINTWISE_MATMUL_DEFAULT
        lraspp3d.POINTWISE_MATMUL_DEFAULT = enabled
        try:
            v = m.init({"params": jax.random.PRNGKey(1)}, x, train=False)
            tab = jax.make_jaxpr(
                lambda vv: m.apply(vv, x, train=False)["out"]
            )(v).pretty_print()

            def loss(variables):
                return jnp.sum(m.apply(variables, x, train=False)["out"] ** 2)

            l, g = jax.value_and_grad(loss)(v)
            return v, tab, l, g
        finally:
            lraspp3d.POINTWISE_MATMUL_DEFAULT = old

    v_mm, jaxpr_mm, l_mm, g_mm = trees_and_loss(True)
    v_conv, jaxpr_conv, l_conv, g_conv = trees_and_loss(False)

    # The toggle must actually switch the lowering (guards against the
    # vacuous-A/B failure mode).
    assert jaxpr_mm.count("conv_general_dilated") < jaxpr_conv.count("conv_general_dilated")

    # Same param tree (shapes + names + values), so checkpoints are
    # interchangeable between the two lowerings.
    assert jax.tree_util.tree_structure(v_mm) == jax.tree_util.tree_structure(v_conv)
    for a, b in zip(jax.tree.leaves(v_mm), jax.tree.leaves(v_conv)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    np.testing.assert_allclose(float(l_mm), float(l_conv), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_mm), jax.tree.leaves(g_conv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
