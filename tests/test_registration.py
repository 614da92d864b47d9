"""Registration utility golden tests vs torch transcriptions of mindssc.py."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from deep_staple_tpu.ops import registration as reg


def _t_kpts_pt(kpts_world, shape, align_corners=None):
    D, H, W = shape
    k = (kpts_world.flip(-1) / (torch.tensor([W, H, D]).float() - 1)) * 2 - 1
    if not align_corners:
        k *= (torch.tensor([W, H, D]).float() - 1) / torch.tensor([W, H, D]).float()
    return k


def test_kpts_roundtrip(rng):
    shape = (10, 12, 14)
    pts = rng.rand(1, 7, 3).astype(np.float32) * 9
    want = _t_kpts_pt(torch.from_numpy(pts), shape).numpy()
    got = np.asarray(reg.kpts_pt(jnp.asarray(pts), shape))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    back = np.asarray(reg.kpts_world(jnp.asarray(got), shape))
    np.testing.assert_allclose(back, pts, rtol=1e-4, atol=1e-4)


def test_flow_roundtrip(rng):
    shape = (8, 9, 10)
    f = rng.randn(5, 3).astype(np.float32)
    pt = reg.flow_pt(jnp.asarray(f), shape, align_corners=True)
    back = np.asarray(reg.flow_world(pt, shape, align_corners=True))
    np.testing.assert_allclose(back, f, rtol=1e-5, atol=1e-5)


def test_pdist_matches_torch(rng):
    x = rng.rand(2, 6, 3).astype(np.float32)
    tx = torch.from_numpy(x)
    xx = (tx**2).sum(2).unsqueeze(2)
    want = (xx + xx.permute(0, 2, 1) - 2 * torch.bmm(tx, tx.permute(0, 2, 1)))
    want[:, torch.arange(6), torch.arange(6)] = 0
    got = np.asarray(reg.pdist(jnp.asarray(x)))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)


def test_knn_graph_symmetric(rng):
    x = jnp.asarray(rng.rand(1, 10, 3).astype(np.float32))
    ind, dist, A = reg.knn_graph(x, 3)
    A = np.asarray(A[0])
    np.testing.assert_array_equal(A, A.T)
    assert A.sum() >= 10 * 3  # at least k edges per node (symmetrized)
    assert ind.shape == (1, 10, 3)


def test_smooth_matches_torch(rng):
    img = rng.rand(1, 2, 8, 9, 10).astype(np.float32)
    sigma = 0.8
    # torch transcription (mindssc.py:113-142)
    t = torch.from_numpy(img)
    N = int(np.ceil(sigma * 3.0 / 2.0)) * 2 + 1
    weight = torch.exp(-torch.pow(torch.linspace(-(N // 2), N // 2, N), 2) / (2 * sigma**2))
    weight /= weight.sum()
    out = t
    for dim in (0, 1, 2):
        B, C, D, H, W = out.shape
        padding = torch.zeros(6)
        padding[[4 - 2 * dim, 5 - 2 * dim]] = N // 2
        view = torch.ones(5)
        view[dim + 2] = -1
        out = F.conv3d(
            F.pad(out.view(B * C, 1, D, H, W), padding.long().tolist(), mode="replicate"),
            weight.view(view.long().tolist()),
        ).view(B, C, D, H, W)
    got = np.asarray(reg.smooth(jnp.asarray(img), sigma))
    np.testing.assert_allclose(got, out.numpy(), rtol=1e-4, atol=1e-5)


def test_minconv_matches_torch(rng):
    cost = rng.rand(4, 5, 5, 5).astype(np.float32)
    t = torch.from_numpy(cost)
    disp_width = 5
    disp1d = torch.linspace(-(disp_width // 2), disp_width // 2, disp_width)
    regular1d = (disp1d.view(1, -1) - disp1d.view(-1, 1)) ** 2
    out = torch.min(t.view(-1, 5, 1, 5, 5) + regular1d.view(1, 5, 5, 1, 1), 1)[0]
    out = torch.min(out.view(-1, 5, 5, 1, 5) + regular1d.view(1, 1, 5, 5, 1), 2)[0]
    out = torch.min(out.view(-1, 5, 5, 5, 1) + regular1d.view(1, 1, 1, 5, 5), 3)[0]
    out = out - torch.min(out.view(-1, 125), 1)[0].view(-1, 1, 1, 1)
    got = np.asarray(reg.minconv(jnp.asarray(cost)))
    np.testing.assert_allclose(got, out.view_as(t).numpy(), rtol=1e-5, atol=1e-6)


def test_ssd_cost_volume_identity_minimum(rng):
    """When moving == fixed, the minimal cost must be at zero displacement."""
    D = H = W = 16
    feat = rng.rand(1, 2, D, H, W).astype(np.float32)
    kpts = reg.kpts_pt(jnp.asarray(np.array([[[8.0, 8.0, 8.0]]], np.float32)), (D, H, W), align_corners=True)
    cost = reg.ssd_cost_volume(
        kpts, jnp.asarray(feat), jnp.asarray(feat), (D, H, W), disp_radius=2, disp_step=1, patch_radius=1
    )
    c = np.asarray(cost)[0, 0]
    assert c.shape == (5, 5, 5)
    assert c.argmin() == np.ravel_multi_index((2, 2, 2), c.shape)
