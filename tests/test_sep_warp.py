"""Gates for the separable 3-pass warp (ops/sep_warp.py).

The separable warp is a deliberate near-approximation of the joint warp
(`torch_utils.py:99-251` semantics): the affine part must invert EXACTLY
(in-range), the b-spline part to sub-voxel accuracy, and the applied
image/label deltas vs the joint warp must stay within the fast-preset noise
envelope established by the int6 gates (tests/test_fast_warp.py). The
Pallas/XLA twin-impl equivalence is asserted on TPU only (the CPU suite runs
the XLA impl; the kernels share `_pass_elem_math` verbatim)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_staple_tpu.ops.augment import (
    AugmentParams,
    augment_sample_pair,
    make_augment_grid,
    make_augment_parts,
    _warp_nearest_zeros,
    _warp_trilinear_border,
)
from deep_staple_tpu.ops.sep_warp import (
    compose_joint_grid,
    sep_warp_apply,
    sep_warp_fields,
)

B, D, H, W = 2, 24, 24, 20


def _data(seed=0):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.randn(B, D, H, W).astype(np.float32))
    zz, yy, xx = np.meshgrid(np.arange(D), np.arange(H), np.arange(W), indexing="ij")
    lbl = ((zz - 12) ** 2 + (yy - 10) ** 2 + (xx - 9) ** 2 < 36).astype(np.int32)
    lbl = jnp.asarray(np.stack([lbl, np.roll(lbl, 3, axis=0)]))
    mod = jnp.asarray((np.asarray(lbl) ^ (rng.rand(B, D, H, W) < 0.02)).astype(np.int32))
    return img, lbl, mod


def _joint(img, lbl, mod, grid):
    wi = _warp_trilinear_border(img, grid)
    packed = (lbl + 256 * mod).astype(jnp.float32)
    wl = _warp_nearest_zeros(packed, grid).astype(jnp.int32)
    return wi, wl % 256, wl // 256


def _in_range_mask(grid):
    g = np.asarray(grid)
    zv = ((g[..., 2] + 1) * D - 1) / 2
    yv = ((g[..., 1] + 1) * H - 1) / 2
    xv = ((g[..., 0] + 1) * W - 1) / 2
    return (
        (zv >= 0) & (zv <= D - 1) & (yv >= 0) & (yv <= H - 1) & (xv >= 0) & (xv <= W - 1)
    )


def _coord_err_voxels(grid_a, grid_b):
    return np.asarray(jnp.abs(grid_a - grid_b) * jnp.asarray([W, H, D]) / 2.0)


def test_identity_exact():
    img, lbl, mod = _data()
    eye = jnp.broadcast_to(jnp.eye(3, 4), (B, 3, 4))
    ctl0 = jnp.zeros((B, 3, 6, 6, 6))
    f = sep_warp_fields(eye, ctl0, (D, H, W))
    si, sl, sm = sep_warp_apply(img, lbl, mod, f, impl="xla")
    # image exact up to int12 quantization (absmax/2047 on the first pass,
    # +/-0.5 unit on the two repacks)
    q = float(jnp.max(jnp.abs(img))) / 2047.0
    assert float(jnp.max(jnp.abs(si - img))) < 2.5 * q
    assert bool((sl == lbl).all()) and bool((sm == mod).all())


def test_translation_matches_joint():
    img, lbl, mod = _data()
    eye = jnp.broadcast_to(jnp.eye(3, 4), (B, 3, 4))
    th = eye.at[:, :, 3].set(jnp.asarray([[0.07, -0.05, 0.11], [-0.1, 0.02, 0.0]]))
    ctl0 = jnp.zeros((B, 3, 6, 6, 6))
    f = sep_warp_fields(th, ctl0, (D, H, W))
    grid = compose_joint_grid(f)
    ji, jl, jm = _joint(img, lbl, mod, grid)
    si, sl, sm = sep_warp_apply(img, lbl, mod, f, impl="xla")
    # pure translation: separable lerp composition == joint trilinear exactly,
    # so only quantization remains; nearest labels identical
    q = float(jnp.max(jnp.abs(img))) / 2047.0
    assert float(jnp.max(jnp.abs(si - ji))) < 2.5 * q
    assert bool((sl == jl).all()) and bool((sm == jm).all())


def test_affine_inversion_exact_in_range():
    key = jax.random.PRNGKey(7)
    p = AugmentParams(bspline_probability=0.0, affine_probability=1.0)
    eff_theta, ctl = make_augment_parts(key, B, (D, H, W), p)
    true_grid = make_augment_grid(key, B, (D, H, W), p)
    f = sep_warp_fields(eff_theta, ctl, (D, H, W))
    cerr = _coord_err_voxels(compose_joint_grid(f), true_grid)
    inr = _in_range_mask(true_grid)
    # the affine part inverts exactly (per-sample linear solves; trilinear
    # upsampling reproduces linear fields) — out-of-range samples use the
    # passes' border extrapolation instead and are excluded (the joint warp
    # clamps/zeros them anyway)
    assert cerr[inr].max() < 1e-3


def test_full_field_accuracy_and_apply_deltas():
    """Operating-point gate: coordinate accuracy of the b-spline inversion
    and applied-voxel deltas vs the joint warp (measured 2026-08-19:
    in-range coord err median 0.014 / p99 0.24 voxel; label agreement
    ~99.7% / ~99.2% — the int6 fast-order gates accept ~1% label deltas)."""
    img, lbl, mod = _data()
    p = AugmentParams()
    errs, agree_l, agree_m = [], [], []
    for s in range(4):
        key = jax.random.PRNGKey(100 + s)
        eff_theta, ctl = make_augment_parts(key, B, (D, H, W), p)
        true_grid = make_augment_grid(key, B, (D, H, W), p)
        f = sep_warp_fields(eff_theta, ctl, (D, H, W))
        cerr = _coord_err_voxels(compose_joint_grid(f), true_grid)
        inr = _in_range_mask(true_grid)
        errs.append(cerr[inr].ravel())
        ji, jl, jm = _joint(img, lbl, mod, true_grid)
        si, sl, sm = sep_warp_apply(img, lbl, mod, f, impl="xla")
        agree_l.append(float((sl == jl).mean()))
        agree_m.append(float((sm == jm).mean()))
    e = np.concatenate(errs)
    assert np.median(e) < 0.05
    assert np.percentile(e, 99) < 0.5
    assert np.mean(agree_l) > 0.985
    assert np.mean(agree_m) > 0.985


def test_augment_sample_pair_fast_sep():
    img, lbl, mod = _data()
    key = jax.random.PRNGKey(3)
    out = augment_sample_pair(key, img, lbl, mod, AugmentParams(), 1.5, order="fast-sep")
    oi, ol, om, grid = out
    assert oi.shape == (B, 36, 36, 30)
    assert ol.shape == oi.shape and om.shape == oi.shape
    assert set(np.unique(np.asarray(ol))) <= {0, 1}
    assert set(np.unique(np.asarray(om))) <= {0, 1}
    assert grid.shape == (B, D, H, W, 3)
    # deterministic under the same key
    out2 = augment_sample_pair(key, img, lbl, mod, AugmentParams(), 1.5, order="fast-sep")
    assert bool(jnp.all(out[0] == out2[0]))
    assert bool(jnp.all(out[1] == out2[1]))
    # close to the 'fast' exact-warp order under the same key (same warp
    # field distribution; interpolation order + inversion differ)
    ref = augment_sample_pair(key, img, lbl, mod, AugmentParams(), 1.5, order="fast")
    assert float((out[1] != ref[1]).mean()) < 0.03
    assert float((out[2] != ref[2]).mean()) < 0.03


def test_fast_sep_downgrades_for_nonbinary():
    from deep_staple_tpu.train.step import resolve_augment_order

    assert resolve_augment_order("fast-sep", 2) == "fast-sep"
    assert resolve_augment_order("fast-sep", 3) == "fast-int8"


def test_shard_map_path_matches_unsharded():
    """The multi-device path (shard_map over 'data' so the Pallas passes run
    shard-locally — sep_warp_apply's mesh arg) must be BIT-exact vs the
    unsharded apply: it is the same per-sample program on batch shards."""
    from deep_staple_tpu.parallel.mesh import make_mesh

    img, lbl, mod = _data()
    key = jax.random.PRNGKey(21)
    eff_theta, ctl = make_augment_parts(key, B, (D, H, W), AugmentParams())
    f = sep_warp_fields(eff_theta, ctl, (D, H, W))
    mesh = make_mesh(data=2, space=1, model=1)
    ri, rl, rm = sep_warp_apply(img, lbl, mod, f)
    si, sl, sm = sep_warp_apply(img, lbl, mod, f, mesh=mesh)
    assert bool((np.asarray(si) == np.asarray(ri)).all())
    assert bool((np.asarray(sl) == np.asarray(rl)).all())
    assert bool((np.asarray(sm) == np.asarray(rm)).all())
    # through the augment plumbing (augment_sample_pair -> sep_warp_apply)
    out = augment_sample_pair(key, img, lbl, mod, AugmentParams(), 1.5, order="fast-sep")
    outm = augment_sample_pair(
        key, img, lbl, mod, AugmentParams(), 1.5, order="fast-sep", mesh=mesh
    )
    for a, b in zip(out[:3], outm[:3]):
        assert bool((np.asarray(a) == np.asarray(b)).all())
    # indivisible batch is a loud error, not a silent wrong answer
    with pytest.raises(ValueError, match="not divisible"):
        sep_warp_apply(img, lbl, mod, f, mesh=make_mesh(data=8, space=1, model=1))


def test_train_step_sep_mesh():
    """make_train_step(mesh=...) with order 'fast-sep' (the driver's
    multi-device production wiring) runs on a data-sharded batch and matches
    the meshless step's pre-update metrics."""
    from deep_staple_tpu.core.config import TrainConfig
    from deep_staple_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from deep_staple_tpu.train.driver import make_model
    from deep_staple_tpu.train.state import create_state
    from deep_staple_tpu.train.step import make_train_step

    config = TrainConfig(
        use_checkpointing=False, ool_mode="fused", augment_order="fast-sep",
        compute_dtype="float32",
    )
    model, _ = make_model(config, 2)
    img, lbl, mod = _data()
    aug = tuple(int(s * 1.5) for s in (D, H, W))
    n = 8
    state, tx = create_state(model, (1,) + aug + (1,), n)
    cw = np.array([0.5, 1.5], np.float32)
    fw = np.full((n,), 5.0, np.float32)
    batch_np = {
        "image": np.asarray(img), "label": np.asarray(lbl),
        "modified_label": np.asarray(mod),
        "dataset_idx": np.arange(B, dtype=np.int32),
    }
    key = jax.random.PRNGKey(0)

    step1 = make_train_step(model, tx, config, cw, fw, pre_interpolation_factor=1.5)
    _, m1 = step1(state, {k: jnp.asarray(v) for k, v in batch_np.items()}, 0.01, key)

    mesh = make_mesh(data=2, space=1, model=1)
    step2 = make_train_step(model, tx, config, cw, fw,
                            pre_interpolation_factor=1.5, mesh=mesh)
    with mesh:
        s2, m2 = step2(replicate_state(state, mesh), shard_batch(batch_np, mesh), 0.01, key)

    np.testing.assert_allclose(
        np.asarray(m1["ce_loss"]), np.asarray(m2["ce_loss"]), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m1["dp_loss"]), np.asarray(m2["dp_loss"]), rtol=2e-4, atol=1e-5
    )


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="Mosaic kernels need TPU")
def test_pallas_impl_matches_xla():
    img, lbl, mod = _data()
    key = jax.random.PRNGKey(11)
    eff_theta, ctl = make_augment_parts(key, B, (D, H, W), AugmentParams())
    f = sep_warp_fields(eff_theta, ctl, (D, H, W))
    xi, xl, xm = sep_warp_apply(img, lbl, mod, f, impl="xla")
    pi, pl_, pm = sep_warp_apply(img, lbl, mod, f, impl="pallas")
    assert bool((xl == pl_).all()) and bool((xm == pm).all())
    np.testing.assert_allclose(np.asarray(pi), np.asarray(xi), rtol=0, atol=1e-5)
