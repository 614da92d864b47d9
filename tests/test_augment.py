"""Augmentation engine tests: smoothing/field numerics vs torch, plus
distribution/shape sanity of the composed pipeline."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from deep_staple_tpu.ops import augment as aug


def test_avg_pool_same_matches_torch(rng):
    x = rng.rand(2, 3, 6, 6, 6).astype(np.float32)
    pool = torch.nn.AvgPool3d(3, stride=1, padding=1)
    want = pool(pool(pool(torch.from_numpy(x)))).numpy()
    got = np.asarray(x)
    for _ in range(3):
        got = np.asarray(aug._avg_pool_same(jnp.asarray(got), 3))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bspline_field_matches_torch_pipeline(rng):
    """Feed identical control points through our pipeline and the reference's
    (AvgPool3d x3 -> trilinear ac=True -> permute), torch_utils.py:190-209."""
    B, D, H, W = 2, 10, 12, 8
    strength = 0.03
    ctl = rng.randn(B, 3, 6, 6, 6).astype(np.float32)

    dim_strength = torch.tensor([D, H, W]).float() * strength
    t_ctl = dim_strength.view(1, 3, 1, 1, 1) * torch.from_numpy(ctl)
    pool = torch.nn.AvgPool3d(3, stride=1, padding=1)
    t_disp = pool(pool(pool(t_ctl)))
    t_disp = F.interpolate(t_disp, size=(D, H, W), mode="trilinear", align_corners=True)
    want = t_disp.permute(0, 2, 3, 4, 1).numpy()

    scaled = jnp.asarray(ctl) * jnp.array([D, H, W], jnp.float32).reshape(1, 3, 1, 1, 1) * strength
    smoothed = scaled
    for _ in range(3):
        smoothed = aug._avg_pool_same(smoothed, 3)
    from deep_staple_tpu.ops.resample import resize_nd

    got = np.asarray(
        jnp.transpose(resize_nd(smoothed, (D, H, W), mode="linear", align_corners=True), (0, 2, 3, 4, 1))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_augment_pair_shares_grid_and_shapes():
    key = jax.random.PRNGKey(0)
    B, D, H, W = 2, 16, 16, 10
    img = jax.random.normal(jax.random.PRNGKey(1), (B, D, H, W))
    lbl = (jax.random.uniform(jax.random.PRNGKey(2), (B, D, H, W)) > 0.7).astype(jnp.int32)

    out_img, out_lbl, out_mod, grid = aug.augment_sample_pair(
        key, img, lbl, lbl, pre_interpolation_factor=1.5
    )
    assert out_img.shape == (B, 24, 24, 15)
    assert out_lbl.shape == (B, 24, 24, 15)
    assert grid.shape == (B, 24, 24, 15, 3)
    # Same grid + same input label => identical warped labels.
    np.testing.assert_array_equal(np.asarray(out_lbl), np.asarray(out_mod))


def test_identity_grid_override_is_noop():
    from deep_staple_tpu.ops import affine_grid_3d

    B, D, H, W = 1, 6, 6, 6
    img = jnp.arange(B * D * H * W, dtype=jnp.float32).reshape(B, D, H, W)
    lbl = (img % 3 == 0).astype(jnp.int32)
    eye = jnp.broadcast_to(jnp.eye(3, 4, dtype=jnp.float32), (B, 3, 4))
    grid = affine_grid_3d(eye, (D, H, W), align_corners=False)
    out_img, out_lbl, _ = aug.spatial_augment(
        jax.random.PRNGKey(0), img, lbl, b_grid_override=grid
    )
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(img), rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_lbl), np.asarray(lbl))
