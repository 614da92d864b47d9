"""Separable N-D resampling with PyTorch `F.interpolate` semantics.

The reference pipeline leans on three distinct torch resize behaviors
(`CrossmodaHybridIdLoader.py:188-218`, `utils/torch_utils.py:67-90`):

  * 'nearest' (legacy asymmetric): src = floor(dst * in/out), or
    floor(dst / scale) when an explicit scale_factor is given with
    recompute_scale_factor=False.
  * '(bi/tri)linear', align_corners=False: src = (dst + 0.5) * in/out - 0.5
    (or (dst + 0.5)/scale - 0.5 with explicit scale), clamped at 0.
  * '(bi/tri)linear', align_corners=True: src = dst * (in-1)/(out-1).

All are implemented as per-axis gathers + lerps so XLA lowers them to cheap
fused gathers rather than a dense gather over the full 3D index space.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _linear_matrix(out_size: int, in_size: int, align_corners: bool, scale) -> jnp.ndarray:
    """(out, in) interpolation matrix with torch coordinate semantics."""
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = dst * (in_size - 1) / max(out_size - 1, 1)
    else:
        ratio = (1.0 / scale) if scale is not None else (in_size / out_size)
        src = np.maximum((dst + 0.5) * ratio - 0.5, 0.0)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w = src - i0
    mat = np.zeros((out_size, in_size), np.float32)
    mat[np.arange(out_size), i0] += 1.0 - w
    mat[np.arange(out_size), i1] += w
    return jnp.asarray(mat)


def _axis_linear(x, axis: int, out_size: int, in_size: int, align_corners: bool, scale):
    """Per-axis linear resize as a dense (out, in) matmul.

    A gather/`jnp.take` formulation lowers to while-loops with
    dynamic-update-slice on TPU (~25-50ms per resize of a feature map); the
    interpolation-matrix contraction rides the MXU instead. The matrix is a
    trace-time constant (indices depend only on static shapes).
    """
    if in_size == out_size and scale in (None, 1.0):
        return x
    mat = _linear_matrix(out_size, in_size, align_corners, scale)
    moved = jnp.moveaxis(x, axis, -1)
    out = jax.lax.dot_general(
        moved.astype(jnp.float32), mat,
        dimension_numbers=(((moved.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return jnp.moveaxis(out, -1, axis)


def _axis_nearest(x, axis: int, out_size: int, in_size: int, scale):
    if in_size == out_size and scale in (None, 1.0):
        return x
    dst = jnp.arange(out_size, dtype=jnp.float32)
    ratio = (1.0 / scale) if scale is not None else (in_size / out_size)
    src = jnp.clip(jnp.floor(dst * ratio).astype(jnp.int32), 0, in_size - 1)
    return jnp.take(x, src, axis=axis)


def resize_nd(x, out_spatial, mode: str = "linear", align_corners: bool = False, scale=None):
    """Resize the trailing ``len(out_spatial)`` axes of ``x``.

    Args:
        x: array of shape (..., *spatial).
        out_spatial: target sizes for the trailing axes.
        mode: 'linear' ((bi/tri)linear depending on rank) or 'nearest'.
        align_corners: torch align_corners semantics (linear mode only).
        scale: optional explicit scale factor (scalar or per-axis sequence)
            matching torch recompute_scale_factor=False behavior.
    """
    n = len(out_spatial)
    if scale is not None and not isinstance(scale, (list, tuple)):
        scale = [scale] * n
    for k in range(n):
        axis = x.ndim - n + k
        in_size = x.shape[axis]
        s = scale[k] if scale is not None else None
        if mode == "nearest":
            x = _axis_nearest(x, axis, int(out_spatial[k]), in_size, s)
        elif mode == "linear":
            x = _axis_linear(x, axis, int(out_spatial[k]), in_size, align_corners, s)
        else:
            raise ValueError(f"Unknown resize mode '{mode}'")
    return x


def interpolate_sample(b_image=None, b_label=None, scale_factor: float = 1.0, use_2d: bool = False):
    """Scale image (linear, align_corners=True) and label (nearest) batches.

    Mirrors `deep_staple/utils/torch_utils.py:67-90`: images are (bi/tri)linear
    with align_corners=True, labels nearest; output size = floor(in * scale).
    Inputs are (B, *spatial); returns the same layout.
    """
    ndim = 2 if use_2d else 3

    def _out_sizes(arr):
        return [int(math.floor(arr.shape[1 + k] * scale_factor)) for k in range(ndim)]

    if b_image is not None:
        b_image = resize_nd(
            b_image, _out_sizes(b_image), mode="linear", align_corners=True, scale=scale_factor
        )
    if b_label is not None:
        b_label = resize_nd(
            b_label.astype(jnp.float32), _out_sizes(b_label), mode="nearest", scale=scale_factor
        ).astype(jnp.int32)
    return b_image, b_label


def pad_to_size(x, size):
    """Symmetric zero padding to ``size`` for a 3D volume (D, H, W).

    Matches the loader's padding rule (`CrossmodaHybridIdLoader.py:191-194`):
    for each axis, pad `dif//2` before and `dif - dif//2` after. Negative
    differences are not cropped (torch F.pad with negative pad crops; the
    reference only hits the positive case after resampling).
    """
    pads = []
    for k in range(3):
        dif = size[k] - x.shape[x.ndim - 3 + k]
        lo = dif // 2
        hi = dif - lo
        pads.append((max(lo, 0), max(hi, 0)))
    full = [(0, 0)] * (x.ndim - 3) + pads
    return jnp.pad(x, full)


def crop_w_dim(x, w_range):
    """Crop the last (W) axis to [w_range[0], w_range[1]).

    Reference: `CrossmodaHybridIdLoader.py:196-197` with
    `crop_3d_w_dim_range=(45, 95)` (`main_deep_staple.py:95`).
    """
    if w_range is None:
        return x
    return x[..., w_range[0] : w_range[1]]
