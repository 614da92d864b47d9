"""Depthwise 3D convolution as 27 shifted fused multiply-adds.

XLA's `conv_general_dilated` with `feature_group_count == channels` lowers 3D
depthwise convolutions poorly on TPU (grouped-conv path; profiler attribution
put the backbone's depthwise/1x1 stages at ~573 ms of a 720 ms model fwd/bwd
at b8/192x192x75 — ~2% MFU). A 3x3x3 depthwise conv is mathematically
`sum_k w[k] * shift_k(x)`: 27 elementwise FMAs over the channels-last tensor,
which the VPU executes at full width and XLA fuses into a single pass.

The backward is a hand-written custom_vjp in the same shifted-FMA form —
grad_x is the stride-transposed conv with the flipped kernel, grad_w is one
fused multi-accumulator reduction. Without it, XLA's autodiff of the 27
slice/pad pairs materializes per-tap padded temps (measured 44.7 GB HBM
demand at b8/192x192x75 — 3x the chip) instead of fusing them.

Semantics match `nn.Conv(features=C, kernel=(3,3,3), padding=k//2, stride=s,
feature_group_count=C, use_bias=False)` exactly (same kernel layout
(kD, kH, kW, 1, C)); fwd/grad gate-tested vs the XLA grouped conv in
tests/test_models.py.

Reference counterpart: the depthwise stage of every backbone block,
`deep_staple/MobileNet_LR_ASPP_3D.py:144` (nn.Conv3d(..., groups=midc)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _shifted_fma(xp, kernel, out_dims, stride: int, flip: bool):
    """sum_k w[k] * xp[k : k+D : stride] over all kernel taps.

    xp is the already-padded input; out_dims the unstrided source extents.
    The 27-term chain accumulates in f32 like XLA's grouped conv (conv
    semantics: low-precision in/out, f32 accumulation) — which on the CPU
    backend is also ~4x faster than bf16 FMAs (XLA-CPU emulates bf16
    arithmetic; f32 is the native vector width). Callers cast back.
    """
    kD, kH, kW = kernel.shape[:3]
    D, H, W = out_dims
    acc_t = jnp.promote_types(xp.dtype, jnp.float32)
    out = None
    for dz in range(kD):
        for dy in range(kH):
            for dx in range(kW):
                w = kernel[kD - 1 - dz, kH - 1 - dy, kW - 1 - dx, 0] if flip else kernel[dz, dy, dx, 0]
                sl = xp[:, dz : dz + D : stride, dy : dy + H : stride, dx : dx + W : stride, :]
                term = sl.astype(acc_t) * w.astype(acc_t)
                out = term if out is None else out + term
    return out


def _pad_spatial(x, pads):
    return jnp.pad(
        x, ((0, 0), (pads[0], pads[0]), (pads[1], pads[1]), (pads[2], pads[2]), (0, 0))
    )


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_conv3d_shifted(x, kernel, stride: int = 1):
    """x: (B, D, H, W, C); kernel: (kD, kH, kW, 1, C); 'same' padding k//2.

    Returns (B, ceil(D/stride), ceil(H/stride), ceil(W/stride), C).
    """
    kD, kH, kW = kernel.shape[:3]
    xp = _pad_spatial(x, (kD // 2, kH // 2, kW // 2))
    return _shifted_fma(xp, kernel, x.shape[1:4], stride, flip=False).astype(x.dtype)


def _dw_fwd(x, kernel, stride: int):
    return depthwise_conv3d_shifted(x, kernel, stride), (x, kernel)


def _dw_bwd(stride: int, res, g):
    x, kernel = res
    kD, kH, kW = kernel.shape[:3]
    pads = (kD // 2, kH // 2, kW // 2)
    D, H, W = x.shape[1:4]

    if stride != 1:
        # Transposed conv: dilate the cotangent back to input resolution.
        gd = jnp.zeros(x.shape[:1] + (D, H, W) + x.shape[4:], g.dtype)
        gd = gd.at[:, ::stride, ::stride, ::stride, :].set(g)
    else:
        gd = g
    gp = _pad_spatial(gd, pads)
    gx = _shifted_fma(gp, kernel, (D, H, W), 1, flip=True)

    # grad_w[k, 0, c] = sum_{b,p} xp[k + stride*p, c] * g[p, c]; one pass over
    # (xp, g) with 27 accumulators (XLA multi-output fusion keeps it fused).
    xp = _pad_spatial(x, pads)
    gw_taps = []
    for dz in range(kD):
        for dy in range(kH):
            for dx in range(kW):
                sl = xp[:, dz : dz + D : stride, dy : dy + H : stride, dx : dx + W : stride, :]
                # f32 accumulation regardless of compute dtype: summing ~3M
                # bf16 products per channel in bf16 would cancel away the
                # mantissa (XLA's grouped conv accumulates in f32 too).
                prod = sl.astype(jnp.float32) * g.astype(jnp.float32)
                gw_taps.append(jnp.sum(prod.reshape(-1, x.shape[-1]), axis=0))
    gw = jnp.stack(gw_taps).reshape(kD, kH, kW, 1, x.shape[-1]).astype(kernel.dtype)
    return gx.astype(x.dtype), gw


depthwise_conv3d_shifted.defvjp(_dw_fwd, _dw_bwd)
