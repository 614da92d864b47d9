"""Golden-value tests: JAX ops vs. torch reference semantics.

torch (CPU) is available in the image, so every numerics op is validated
directly against the exact torch call the reference makes.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from deep_staple_tpu.ops import (
    dice2d,
    dice3d,
    resize_nd,
    interpolate_sample,
    pad_to_size,
    crop_w_dim,
    grid_sample_2d,
    grid_sample_3d,
    affine_grid_2d,
    affine_grid_3d,
    make_2d_stack_from_3d,
    make_3d_from_2d_stack,
    get_2d_stack_batch_size,
)


def _torch_dice3d(pred, tgt, nan_for_unlabeled):
    # Reference formula from deep_staple/metrics.py:_diceNd
    pred = torch.movedim(pred, -1, 1)
    tgt = torch.movedim(tgt, -1, 1)
    b, c = tgt.shape[:2]
    out = torch.zeros(b, c)
    for ln in range(c):
        pp = pred[:, ln] == 1
        pl = tgt[:, ln] == 1
        tp = torch.logical_and(pp, pl).reshape(b, -1).sum(-1)
        ppc = pp.reshape(b, -1).sum(-1)
        plc = pl.reshape(b, -1).sum(-1)
        nc = 0.0 if nan_for_unlabeled else 1e-10
        out[:, ln] = 2.0 * tp / (ppc + plc + nc)
    return out


@pytest.mark.parametrize("nan_mode", [True, False])
def test_dice3d_matches_reference_formula(rng, nan_mode):
    pred = rng.randint(0, 2, size=(3, 8, 7, 6)).astype(np.int64)
    tgt = rng.randint(0, 2, size=(3, 8, 7, 6)).astype(np.int64)
    # Make one sample empty on both sides to exercise the NaN path.
    pred[2] = 0
    tgt[2] = 0
    pred_oh = torch.nn.functional.one_hot(torch.from_numpy(pred), 2)
    tgt_oh = torch.nn.functional.one_hot(torch.from_numpy(tgt), 2)
    want = _torch_dice3d(pred_oh, tgt_oh, nan_mode).numpy()
    got = np.asarray(
        dice3d(jnp.asarray(pred_oh.numpy()), jnp.asarray(tgt_oh.numpy()), True, nan_mode)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, equal_nan=True)


def test_dice2d_matches(rng):
    pred = rng.randint(0, 3, size=(2, 9, 5)).astype(np.int64)
    tgt = rng.randint(0, 3, size=(2, 9, 5)).astype(np.int64)
    pred_oh = torch.nn.functional.one_hot(torch.from_numpy(pred), 3)
    tgt_oh = torch.nn.functional.one_hot(torch.from_numpy(tgt), 3)
    want = _torch_dice3d(pred_oh.unsqueeze(-2), tgt_oh.unsqueeze(-2), False).numpy()
    got = np.asarray(dice2d(jnp.asarray(pred_oh.numpy()), jnp.asarray(tgt_oh.numpy()), True, False))
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("size_in,size_out", [((13, 11, 9), (128, 16, 20)), ((30, 30, 30), (7, 9, 11))])
def test_resize_nearest_matches_torch_size(rng, size_in, size_out):
    x = rng.rand(1, 1, *size_in).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=size_out, mode="nearest").numpy()
    got = np.asarray(resize_nd(jnp.asarray(x), size_out, mode="nearest"))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_resize_trilinear_matches_torch_size(rng):
    x = rng.rand(2, 1, 13, 11, 9).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(20, 16, 24), mode="trilinear", align_corners=False).numpy()
    got = np.asarray(resize_nd(jnp.asarray(x), (20, 16, 24), mode="linear", align_corners=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("scale", [1.5, 2.0, 0.5])
def test_interpolate_sample_matches_torch_scale_factor(rng, scale):
    img = rng.rand(2, 16, 14, 10).astype(np.float32)
    lbl = rng.randint(0, 2, size=(2, 16, 14, 10)).astype(np.int64)

    t_img = F.interpolate(
        torch.from_numpy(img).unsqueeze(1), scale_factor=[scale] * 3, mode="trilinear",
        align_corners=True, recompute_scale_factor=False,
    ).squeeze(1).numpy()
    t_lbl = F.interpolate(
        torch.from_numpy(lbl).unsqueeze(1).float(), scale_factor=[scale] * 3, mode="nearest",
        recompute_scale_factor=False,
    ).long().squeeze(1).numpy()

    j_img, j_lbl = interpolate_sample(jnp.asarray(img), jnp.asarray(lbl), scale, use_2d=False)
    np.testing.assert_allclose(np.asarray(j_img), t_img, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(j_lbl), t_lbl)


def test_pad_and_crop_match_reference(rng):
    x = rng.rand(10, 12, 14).astype(np.float32)
    size = (16, 13, 20)
    difs = [size[0] - 10, size[1] - 12, size[2] - 14]
    pad = (
        difs[-1] // 2, difs[-1] - difs[-1] // 2,
        difs[-2] // 2, difs[-2] - difs[-2] // 2,
        difs[-3] // 2, difs[-3] - difs[-3] // 2,
    )
    want = F.pad(torch.from_numpy(x), [max(p, 0) for p in pad]).numpy()
    got = np.asarray(pad_to_size(jnp.asarray(x), size))
    np.testing.assert_array_equal(got, want)

    np.testing.assert_array_equal(
        np.asarray(crop_w_dim(jnp.asarray(x), (3, 9))), x[..., 3:9]
    )


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("mode,padding", [("bilinear", "zeros"), ("bilinear", "border"), ("nearest", "zeros"), ("nearest", "border")])
def test_grid_sample_3d_matches_torch(rng, mode, padding, align_corners):
    x = rng.rand(2, 3, 7, 6, 5).astype(np.float32)
    grid = (rng.rand(2, 4, 5, 6, 3).astype(np.float32) * 2.4 - 1.2)  # includes OOB
    want = F.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid), mode=mode, padding_mode=padding,
        align_corners=align_corners,
    ).numpy()
    got = np.asarray(
        grid_sample_3d(jnp.asarray(x), jnp.asarray(grid), mode=mode, padding_mode=padding, align_corners=align_corners)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode,padding", [("bilinear", "border"), ("nearest", "zeros")])
def test_grid_sample_2d_matches_torch(rng, mode, padding):
    x = rng.rand(2, 2, 9, 8).astype(np.float32)
    grid = (rng.rand(2, 7, 6, 2).astype(np.float32) * 2.4 - 1.2)
    want = F.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid), mode=mode, padding_mode=padding, align_corners=False
    ).numpy()
    got = np.asarray(grid_sample_2d(jnp.asarray(x), jnp.asarray(grid), mode=mode, padding_mode=padding))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
def test_affine_grid_3d_matches_torch(rng, align_corners):
    theta = (np.eye(3, 4)[None] + 0.1 * rng.randn(2, 3, 4)).astype(np.float32)
    want = F.affine_grid(torch.from_numpy(theta), (2, 1, 5, 6, 7), align_corners=align_corners).numpy()
    got = np.asarray(affine_grid_3d(jnp.asarray(theta), (5, 6, 7), align_corners=align_corners))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_affine_grid_2d_matches_torch(rng):
    theta = (np.eye(2, 3)[None] + 0.1 * rng.randn(3, 2, 3)).astype(np.float32)
    want = F.affine_grid(torch.from_numpy(theta), (3, 1, 6, 7), align_corners=False).numpy()
    got = np.asarray(affine_grid_2d(jnp.asarray(theta), (6, 7), align_corners=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("stack_dim", ["D", "H", "W"])
def test_stacking_roundtrip(rng, stack_dim):
    x = rng.rand(2, 3, 4, 5, 6).astype(np.float32)
    stacked = make_2d_stack_from_3d(jnp.asarray(x), stack_dim)
    assert stacked.shape[0] == get_2d_stack_batch_size(x.shape, stack_dim)
    restored = make_3d_from_2d_stack(stacked, stack_dim, 2)
    np.testing.assert_array_equal(np.asarray(restored), x)
