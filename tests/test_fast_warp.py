"""Fast warp paths must match the reference-semantics grid_sample exactly."""

import numpy as np

import jax
import jax.numpy as jnp

from deep_staple_tpu.ops.augment import _warp_trilinear_border, _warp_nearest_zeros
from deep_staple_tpu.ops.grid_sample import grid_sample_3d


def _random_grid(rng, B, spatial, scale=1.3):
    return jnp.asarray((rng.rand(B, *spatial, 3).astype(np.float32) * 2 * scale - scale))


def test_warp_trilinear_border_matches_grid_sample(rng):
    B, D, H, W = 2, 9, 8, 7
    vol = jnp.asarray(rng.randn(B, D, H, W).astype(np.float32))
    grid = _random_grid(rng, B, (5, 6, 4))
    want = np.asarray(
        grid_sample_3d(vol[:, None], grid, mode="bilinear", padding_mode="border", align_corners=False)
    )[:, 0]
    got = np.asarray(_warp_trilinear_border(vol, grid))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_warp_nearest_zeros_matches_grid_sample(rng):
    B, D, H, W = 2, 9, 8, 7
    vol = jnp.asarray(rng.randint(0, 5, size=(B, D, H, W)).astype(np.float32))
    grid = _random_grid(rng, B, (5, 6, 4))
    want = np.asarray(
        grid_sample_3d(vol[:, None], grid, mode="nearest", padding_mode="zeros", align_corners=False)
    )[:, 0]
    got = np.asarray(_warp_nearest_zeros(vol, grid))
    np.testing.assert_array_equal(got, want)


def test_fast_order_equals_reference_under_identity_warp(rng):
    from deep_staple_tpu.ops.augment import AugmentParams, augment_sample_pair

    params = AugmentParams(
        noise_strength=0.0, bspline_probability=0.0, affine_probability=0.0,
        bspline_strength=0.0, affine_strength=0.0,
    )
    img = jnp.asarray(rng.randn(2, 12, 12, 8).astype(np.float32))
    lbl = jnp.asarray((rng.rand(2, 12, 12, 8) > 0.8).astype(np.int32))
    key = jax.random.PRNGKey(0)
    ref = augment_sample_pair(key, img, lbl, lbl, params, 1.5, order="reference")
    fast = augment_sample_pair(key, img, lbl, lbl, params, 1.5, order="fast")
    np.testing.assert_allclose(np.asarray(fast[0]), np.asarray(ref[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(fast[1]), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(fast[2]), np.asarray(ref[2]))


def test_fast_order_statistics(rng):
    """Non-identity warps: fast order keeps shapes and label mass plausible."""
    from deep_staple_tpu.ops.augment import augment_sample_pair

    img = jnp.asarray(rng.randn(2, 16, 16, 10).astype(np.float32))
    lbl = jnp.zeros((2, 16, 16, 10), jnp.int32).at[:, 5:11, 5:11, 3:7].set(1)
    out_img, out_lbl, out_mod, grid = augment_sample_pair(
        jax.random.PRNGKey(3), img, lbl, lbl, pre_interpolation_factor=1.5, order="fast"
    )
    assert out_img.shape == (2, 24, 24, 15)
    assert out_lbl.shape == (2, 24, 24, 15)
    assert grid.shape == (2, 16, 16, 10, 3)  # grid at base resolution
    np.testing.assert_array_equal(np.asarray(out_lbl), np.asarray(out_mod))
    # warped label mass within 2x of the identity-scaled mass
    scale = (24 * 24 * 15) / (16 * 16 * 10)
    for b in range(2):
        m = int(np.asarray(out_lbl[b]).sum())
        assert 0.3 * scale * 216 < m < 3 * scale * 216


def test_warp_edge_exact_coordinates():
    # x exactly on the last voxel: pair-shift path must return vol[..., -1]
    B, D, H, W = 1, 4, 4, 4
    vol = jnp.arange(B * D * H * W, dtype=jnp.float32).reshape(B, D, H, W)
    # normalized coord hitting x = W-1 exactly (ac=False): c = (2*(W-1)+1)/W - 1
    cx = (2 * (W - 1) + 1) / W - 1
    grid = jnp.full((B, 2, 2, 2, 3), cx, jnp.float32)
    want = np.asarray(
        grid_sample_3d(vol[:, None], grid, mode="bilinear", padding_mode="border", align_corners=False)
    )[:, 0]
    got = np.asarray(_warp_trilinear_border(vol, grid))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_warp_trilinear_bf16pack_close_to_exact(rng):
    """The bf16-pair-packed warp (4 gathers) must stay within bf16 rounding
    of the exact 8-gather warp — well below the augmentation pipeline's own
    additive-noise floor (strength 0.05)."""
    from deep_staple_tpu.ops.augment import _warp_trilinear_border_bf16pack

    B, D, H, W = 2, 14, 13, 9
    vol = jnp.asarray(rng.randn(B, D, H, W).astype(np.float32))
    grid = _random_grid(rng, B, (10, 11, 7))
    exact = np.asarray(_warp_trilinear_border(vol, grid))
    packed = np.asarray(_warp_trilinear_border_bf16pack(vol, grid))
    # bf16 has ~3 decimal digits; values are ~N(0,1)
    np.testing.assert_allclose(packed, exact, rtol=0, atol=2e-2)
    assert float(np.abs(packed - exact).mean()) < 3e-3


def test_fast_bf16_order_runs_and_matches_fast_closely(rng):
    from deep_staple_tpu.ops.augment import AugmentParams, augment_sample_pair

    img = jnp.asarray(rng.randn(2, 12, 12, 8).astype(np.float32))
    lbl = jnp.asarray((rng.rand(2, 12, 12, 8) > 0.8).astype(np.int32))
    key = jax.random.PRNGKey(4)
    fast = augment_sample_pair(key, img, lbl, lbl, AugmentParams(), 1.5, order="fast")
    fb16 = augment_sample_pair(key, img, lbl, lbl, AugmentParams(), 1.5, order="fast-bf16")
    # same PRNG stream -> same warp; image differs only by bf16 rounding
    np.testing.assert_allclose(np.asarray(fb16[0]), np.asarray(fast[0]), rtol=0, atol=3e-2)
    # labels are bit-identical (packed nearest gather is shared & exact)
    np.testing.assert_array_equal(np.asarray(fb16[1]), np.asarray(fast[1]))
    np.testing.assert_array_equal(np.asarray(fb16[2]), np.asarray(fast[2]))


def test_reference_bf16_order_matches_reference_closely(rng):
    from deep_staple_tpu.ops.augment import AugmentParams, augment_sample_pair

    img = jnp.asarray(rng.randn(2, 12, 12, 8).astype(np.float32))
    lbl = jnp.asarray((rng.rand(2, 12, 12, 8) > 0.8).astype(np.int32))
    key = jax.random.PRNGKey(9)
    ref = augment_sample_pair(key, img, lbl, lbl, AugmentParams(), 1.5, order="reference")
    rb16 = augment_sample_pair(key, img, lbl, lbl, AugmentParams(), 1.5, order="reference-bf16")
    np.testing.assert_allclose(np.asarray(rb16[0]), np.asarray(ref[0]), rtol=0, atol=3e-2)
    np.testing.assert_array_equal(np.asarray(rb16[1]), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(rb16[2]), np.asarray(ref[2]))


def test_warp_trilinear_int8pack_close_to_exact(rng):
    """The int8 quad-packed warp (2 gathers) must stay within half a
    quantization step (absmax/254) of the exact 8-gather warp."""
    from deep_staple_tpu.ops.augment import _warp_trilinear_border_int8pack

    B, D, H, W = 2, 14, 13, 9
    vol = jnp.asarray(rng.randn(B, D, H, W).astype(np.float32))
    grid = _random_grid(rng, B, (10, 11, 7))
    exact = np.asarray(_warp_trilinear_border(vol, grid))
    packed = np.asarray(_warp_trilinear_border_int8pack(vol, grid))
    absmax = np.abs(np.asarray(vol)).max(axis=(1, 2, 3))
    for b in range(B):
        # trilinear blend of per-corner errors each <= absmax/254 (+eps)
        assert np.abs(packed[b] - exact[b]).max() <= absmax[b] / 254 * 1.01


def test_warp_int8pack_edge_exact_coordinates():
    # x and y exactly on the last voxel: quad-shift path must return the
    # border value (weight fully on the high corners).
    from deep_staple_tpu.ops.augment import _warp_trilinear_border_int8pack

    B, D, H, W = 1, 4, 4, 4
    vol = jnp.arange(B * D * H * W, dtype=jnp.float32).reshape(B, D, H, W)
    cx = (2 * (W - 1) + 1) / W - 1
    cy = (2 * (H - 1) + 1) / H - 1
    grid = jnp.zeros((B, 2, 2, 2, 3), jnp.float32).at[..., 0].set(cx).at[..., 1].set(cy)
    want = np.asarray(
        grid_sample_3d(vol[:, None], grid, mode="bilinear", padding_mode="border", align_corners=False)
    )[:, 0]
    got = np.asarray(_warp_trilinear_border_int8pack(vol, grid))
    np.testing.assert_allclose(got, want, rtol=0, atol=float(np.abs(vol).max()) / 254 * 1.01)


def test_int8_orders_run_and_labels_exact(rng):
    from deep_staple_tpu.ops.augment import AugmentParams, augment_sample_pair

    img = jnp.asarray(rng.randn(2, 12, 12, 8).astype(np.float32))
    lbl = jnp.asarray((rng.rand(2, 12, 12, 8) > 0.8).astype(np.int32))
    key = jax.random.PRNGKey(11)
    for base, packed in (("fast", "fast-int8"), ("reference", "reference-int8")):
        a = augment_sample_pair(key, img, lbl, lbl, AugmentParams(), 1.5, order=base)
        b = augment_sample_pair(key, img, lbl, lbl, AugmentParams(), 1.5, order=packed)
        # same PRNG stream -> same warp; image differs only by int8 quantization
        np.testing.assert_allclose(np.asarray(b[0]), np.asarray(a[0]), rtol=0, atol=6e-2)
        np.testing.assert_array_equal(np.asarray(b[1]), np.asarray(a[1]))
        np.testing.assert_array_equal(np.asarray(b[2]), np.asarray(a[2]))


def test_unknown_augment_order_raises(rng):
    from deep_staple_tpu.ops.augment import AugmentParams, augment_sample_pair

    img = jnp.asarray(rng.randn(1, 8, 8, 6).astype(np.float32))
    lbl = jnp.zeros((1, 8, 8, 6), jnp.int32)
    import pytest

    with pytest.raises(ValueError, match="unknown augment order"):
        augment_sample_pair(jax.random.PRNGKey(0), img, lbl, lbl,
                            AugmentParams(), 1.5, order="fast_bf16")


def test_warp_fused_int6pack_matches_exact_warps(rng):
    """The fused 2-gather warp: image within half an int6 step of the exact
    trilinear warp; BOTH label streams bit-exact vs the nearest/zeros warp."""
    from deep_staple_tpu.ops.augment import _warp_fused_int6pack

    B, D, H, W = 2, 14, 13, 9
    vol = jnp.asarray(rng.randn(B, D, H, W).astype(np.float32))
    lbl = jnp.asarray((rng.rand(B, D, H, W) > 0.8).astype(np.int32))
    mod = jnp.asarray((rng.rand(B, D, H, W) > 0.7).astype(np.int32))
    grid = _random_grid(rng, B, (10, 11, 7))

    img, lw, mw = (np.asarray(a) for a in _warp_fused_int6pack(vol, lbl, mod, grid))
    exact = np.asarray(_warp_trilinear_border(vol, grid))
    absmax = np.abs(np.asarray(vol)).max(axis=(1, 2, 3))
    for b in range(B):
        # trilinear blend of per-corner errors each <= absmax/62 (+eps)
        assert np.abs(img[b] - exact[b]).max() <= absmax[b] / 62 * 1.01
    np.testing.assert_array_equal(lw, np.asarray(_warp_nearest_zeros(lbl.astype(jnp.float32), grid)))
    np.testing.assert_array_equal(mw, np.asarray(_warp_nearest_zeros(mod.astype(jnp.float32), grid)))


def test_warp_fused_int6pack_edge_exact_coordinates():
    # x and y exactly on the last voxel: the pair-clamped quad must return
    # the border value for the image and the last voxel's labels.
    from deep_staple_tpu.ops.augment import _warp_fused_int6pack

    B, D, H, W = 1, 4, 4, 4
    vol = jnp.arange(B * D * H * W, dtype=jnp.float32).reshape(B, D, H, W)
    lbl = (jnp.arange(B * D * H * W, dtype=jnp.int32).reshape(B, D, H, W) % 2)
    cx = (2 * (W - 1) + 1) / W - 1
    cy = (2 * (H - 1) + 1) / H - 1
    grid = jnp.zeros((B, 2, 2, 2, 3), jnp.float32).at[..., 0].set(cx).at[..., 1].set(cy)
    want_img = np.asarray(
        grid_sample_3d(vol[:, None], grid, mode="bilinear", padding_mode="border", align_corners=False)
    )[:, 0]
    want_lbl = np.asarray(
        grid_sample_3d(lbl[:, None].astype(jnp.float32), grid, mode="nearest",
                       padding_mode="zeros", align_corners=False)
    )[:, 0]
    img, lw, mw = (np.asarray(a) for a in _warp_fused_int6pack(vol, lbl, lbl, grid))
    np.testing.assert_allclose(img, want_img, rtol=0, atol=float(np.abs(vol).max()) / 62 * 1.01)
    np.testing.assert_array_equal(lw, want_lbl)
    np.testing.assert_array_equal(mw, want_lbl)


def test_int6_orders_labels_exact_and_image_close(rng):
    from deep_staple_tpu.ops.augment import AugmentParams, augment_sample_pair

    img = jnp.asarray(rng.randn(2, 12, 12, 8).astype(np.float32))
    lbl = jnp.asarray((rng.rand(2, 12, 12, 8) > 0.8).astype(np.int32))
    mod = jnp.asarray((rng.rand(2, 12, 12, 8) > 0.7).astype(np.int32))
    key = jax.random.PRNGKey(11)
    for base, fused in (("fast", "fast-int6"), ("reference", "reference-int6")):
        a = augment_sample_pair(key, img, lbl, mod, AugmentParams(), 1.5, order=base)
        b = augment_sample_pair(key, img, lbl, mod, AugmentParams(), 1.5, order=fused)
        # same PRNG stream -> same warp grid; labels are noise-independent
        # and must match the base order bit-exactly.
        np.testing.assert_array_equal(np.asarray(b[1]), np.asarray(a[1]))
        np.testing.assert_array_equal(np.asarray(b[2]), np.asarray(a[2]))
        # image differs by int6 quantization + the (smaller) compensated
        # noise draw: bounded by quant step + noise delta
        assert np.abs(np.asarray(b[0]) - np.asarray(a[0])).max() < 0.35


def test_int6_noise_budget_total_variance(rng):
    """Under an identity warp, quantization + compensated noise must add up
    to the configured perturbation variance (the budget-compensation claim)."""
    from deep_staple_tpu.ops.augment import AugmentParams, augment_sample_pair

    img = jnp.asarray((rng.rand(1, 24, 24, 16).astype(np.float32) * 6.2 - 3.1))
    lbl = jnp.zeros((1, 24, 24, 16), jnp.int32)
    params = AugmentParams(noise_strength=0.05, bspline_probability=0.0, affine_probability=0.0,
                           affine_strength=0.0, bspline_strength=0.0)
    out, _, _, _ = augment_sample_pair(
        jax.random.PRNGKey(5), img, lbl, lbl, params, 1.0, order="reference-int6"
    )
    resid = np.asarray(out) - np.asarray(img)
    total_sd = resid.std()
    assert 0.035 < total_sd < 0.065, total_sd  # ~strength, not strength+quant


def test_int6_order_requires_binary_labels():
    import pytest

    from deep_staple_tpu.core.config import TrainConfig
    from deep_staple_tpu.train.step import make_train_step

    config = TrainConfig(augment_order="fast-int6")
    with pytest.raises(ValueError, match="binary labels"):
        make_train_step(None, None, config, np.ones(3, np.float32), np.ones(4, np.float32))
