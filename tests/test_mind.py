"""MIND-SSC vs a working torch transcription of the reference formula.

The reference's `mindssc` is broken as shipped (missing `mind_utils` import,
mindssc.py:264,280); this test reconstructs the intended torch pipeline with
the module-level helpers and compares our fixed JAX implementation to it.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from deep_staple_tpu.ops.mind import mindssc, _ssc_shift_pairs, _CPP_ORDER


def _torch_pdist(x):
    xx = (x**2).sum(dim=2).unsqueeze(2)
    yy = xx.permute(0, 2, 1)
    dist = xx + yy - 2.0 * torch.bmm(x, x.permute(0, 2, 1))
    dist[:, torch.arange(dist.shape[1]), torch.arange(dist.shape[2])] = 0
    return dist


def _torch_filter1d(img, weight, dim):
    B, C, D, H, W = img.shape
    N = weight.shape[0]
    padding = torch.zeros(6)
    padding[[4 - 2 * dim, 5 - 2 * dim]] = N // 2
    padding = padding.long().tolist()
    view = torch.ones(5)
    view[dim + 2] = -1
    view = view.long().tolist()
    return F.conv3d(
        F.pad(img.view(B * C, 1, D, H, W), padding, mode="replicate"), weight.view(view)
    ).view(B, C, D, H, W)


def _torch_smooth(img, sigma):
    sigma_t = torch.tensor([sigma])
    N = torch.ceil(sigma_t * 3.0 / 2.0).long().item() * 2 + 1
    weight = torch.exp(-torch.pow(torch.linspace(-(N // 2), N // 2, N), 2) / (2 * sigma_t**2))
    weight /= weight.sum()
    for dim in (0, 1, 2):
        img = _torch_filter1d(img, weight, dim)
    return img


def _torch_mindssc(img, delta=1, sigma=0.8):
    six = torch.tensor(
        [[0, 1, 1], [1, 1, 0], [1, 0, 1], [1, 1, 2], [2, 1, 1], [1, 2, 1]], dtype=torch.float
    )
    dist = _torch_pdist(six.unsqueeze(0)).squeeze(0)
    x, y = torch.meshgrid(torch.arange(6), torch.arange(6), indexing="ij")
    mask = (x > y).reshape(-1) & (dist == 2).reshape(-1)
    idx_shift1 = six.unsqueeze(1).repeat(1, 6, 1).view(-1, 3)[mask].long()
    idx_shift2 = six.unsqueeze(0).repeat(6, 1, 1).view(-1, 3)[mask].long()
    mshift1 = torch.zeros(12, 1, 3, 3, 3)
    mshift1.view(-1)[
        torch.arange(12) * 27 + idx_shift1[:, 0] * 9 + idx_shift1[:, 1] * 3 + idx_shift1[:, 2]
    ] = 1
    mshift2 = torch.zeros(12, 1, 3, 3, 3)
    mshift2.view(-1)[
        torch.arange(12) * 27 + idx_shift2[:, 0] * 9 + idx_shift2[:, 1] * 3 + idx_shift2[:, 2]
    ] = 1
    rpad = nn.ReplicationPad3d(delta)
    ssd = _torch_smooth(
        (F.conv3d(rpad(img), mshift1, dilation=delta) - F.conv3d(rpad(img), mshift2, dilation=delta))
        ** 2,
        sigma,
    )
    mind = ssd - torch.min(ssd, 1, keepdim=True)[0]
    mind_var = torch.mean(mind, 1, keepdim=True)
    mind_var = torch.clamp(mind_var, mind_var.mean() * 0.001, mind_var.mean() * 1000)
    mind /= mind_var
    mind = torch.exp(-mind)
    return mind[:, torch.tensor([6, 8, 1, 11, 2, 10, 0, 7, 9, 4, 5, 3]).long()]


def test_shift_pairs_are_12_at_sq_dist_2():
    i1, i2 = _ssc_shift_pairs()
    assert i1.shape == (12, 3) and i2.shape == (12, 3)
    assert (((i1 - i2) ** 2).sum(-1) == 2).all()


def test_mindssc_matches_torch_reference(rng):
    img = rng.rand(1, 1, 10, 9, 8).astype(np.float32)
    want = _torch_mindssc(torch.from_numpy(img)).numpy()
    got = np.asarray(mindssc(jnp.asarray(img)))
    assert got.shape == (1, 12, 10, 9, 8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
