"""MIND-SSC self-similarity descriptors (Heinrich et al., MICCAI 2013).

Capability parity with `deep_staple/mindssc.py:250-292` — 12-channel
self-similarity context features fed to the network when `use_mind` is on
(`main_deep_staple.py:81,691-698`). The reference implementation is broken as
shipped (it calls `mind_utils.pdist`/`mind_utils.smooth` without importing
`mind_utils`, :264,280 — a NameError); this is the fixed, working equivalent
(SURVEY.md §7 "known reference bugs to fix, not copy").

Pipeline: 12 paired 3x3x3 one-hot shift kernels from the 6-neighbourhood
(pairs at squared distance 2), dilated conv of the replication-padded image
with each kernel, Gaussian-smoothed SSD between the paired shifts,
variance-normalized exponential, channel permutation matching the original
C++ ordering. The shift "convolution" is a pure gather, so instead of 24
dilated conv3d calls this implementation rolls the padded volume (XLA slices,
no FLOPs) — identical numerics, far less HBM traffic.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _ssc_shift_pairs():
    """The 12 (shift1, shift2) voxel-offset pairs (reference :256-276)."""
    six = np.array(
        [[0, 1, 1], [1, 1, 0], [1, 0, 1], [1, 1, 2], [2, 1, 1], [1, 2, 1]], np.int64
    )
    # squared pairwise distances
    dist = ((six[None, :, :] - six[:, None, :]) ** 2).sum(-1)
    x, y = np.meshgrid(np.arange(6), np.arange(6), indexing="ij")
    mask = (x > y).reshape(-1) & (dist == 2).reshape(-1)
    idx_shift1 = six[np.repeat(np.arange(6), 6)][mask]
    idx_shift2 = six[np.tile(np.arange(6), 6)][mask]
    return idx_shift1, idx_shift2


# channel permutation matching the original C++ ordering (reference :290)
_CPP_ORDER = np.array([6, 8, 1, 11, 2, 10, 0, 7, 9, 4, 5, 3])


def _replication_pad_3d(x, pad: int):
    """torch nn.ReplicationPad3d semantics on (B, C, D, H, W)."""
    for axis in (2, 3, 4):
        first = jnp.take(x, jnp.zeros(pad, jnp.int32), axis=axis)
        last = jnp.take(x, jnp.full(pad, x.shape[axis] - 1, jnp.int32), axis=axis)
        x = jnp.concatenate([first, x, last], axis=axis)
    return x


def _gauss_kernel(sigma: float):
    n = int(math.ceil(sigma * 3.0 / 2.0)) * 2 + 1
    xs = np.linspace(-(n // 2), n // 2, n)
    w = np.exp(-(xs**2) / (2 * sigma**2))
    return (w / w.sum()).astype(np.float32)


def _smooth(x, sigma: float):
    """Separable Gaussian with replicate padding (reference filter1D/smooth,
    mindssc.py:113-142), on (B, C, D, H, W)."""
    w = jnp.asarray(_gauss_kernel(sigma))
    n = w.shape[0]
    pad = n // 2
    for axis in (2, 3, 4):
        first = jnp.take(x, jnp.zeros(pad, jnp.int32), axis=axis)
        last = jnp.take(x, jnp.full(pad, x.shape[axis] - 1, jnp.int32), axis=axis)
        xp = jnp.concatenate([first, x, last], axis=axis)
        # windowed weighted sum along `axis` via shifted slices (small n)
        acc = 0.0
        for k in range(n):
            sl = [slice(None)] * 5
            sl[axis] = slice(k, k + x.shape[axis])
            acc = acc + w[k] * xp[tuple(sl)]
        x = acc
    return x


@partial(jax.jit, static_argnames=("delta",))
def mindssc(img, delta: int = 1, sigma: float = 0.8):
    """img: (B, 1, D, H, W) float -> (B, 12, D, H, W) MIND-SSC features."""
    assert img.ndim == 5 and img.shape[1] == 1, f"expect (B,1,D,H,W), got {img.shape}"
    idx1, idx2 = _ssc_shift_pairs()

    padded = _replication_pad_3d(img, delta)
    D, H, W = img.shape[2:]

    def shifted(offsets):
        # conv with a one-hot kernel at voxel offset o (dilation=delta) ==
        # slice of the padded volume starting at o*delta.
        chans = []
        for o in offsets:
            sl = (
                slice(None),
                slice(None),
                slice(o[0] * delta, o[0] * delta + D),
                slice(o[1] * delta, o[1] * delta + H),
                slice(o[2] * delta, o[2] * delta + W),
            )
            chans.append(padded[sl])
        return jnp.concatenate(chans, axis=1)

    diff = shifted(idx1) - shifted(idx2)
    ssd = _smooth(diff * diff, sigma)

    mind = ssd - jnp.min(ssd, axis=1, keepdims=True)
    mind_var = jnp.mean(mind, axis=1, keepdims=True)
    mean_var = jnp.mean(mind_var)
    mind_var = jnp.clip(mind_var, mean_var * 0.001, mean_var * 1000)
    mind = jnp.exp(-mind / mind_var)
    return mind[:, jnp.asarray(_CPP_ORDER)]
