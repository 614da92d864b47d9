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
