"""Depthwise 3D convolution as 27 shifted fused multiply-adds.

XLA's `conv_general_dilated` with `feature_group_count == channels` lowers 3D
depthwise convolutions poorly on TPU (grouped-conv path; profiler attribution
put the backbone's depthwise/1x1 stages at ~573 ms of a 720 ms model fwd/bwd
at b8/192x192x75 — ~2% MFU). A 3x3x3 depthwise conv is mathematically
`sum_k w[k] * shift_k(x)`: 27 elementwise FMAs over the channels-last tensor,
which the VPU executes at full width and XLA fuses into a single pass.
Backward differentiates into the mirrored shifted FMAs — no grouped-conv
transpose in either direction.

Semantics match `nn.Conv(features=C, kernel=(3,3,3), padding=1, stride=s,
feature_group_count=C, use_bias=False)` exactly (same kernel layout
(kD, kH, kW, 1, C)); gate-tested in tests/test_models.py.

Reference counterpart: the depthwise stage of every backbone block,
`deep_staple/MobileNet_LR_ASPP_3D.py:144` (nn.Conv3d(..., groups=midc)).
"""

from __future__ import annotations

import jax.numpy as jnp


def depthwise_conv3d_shifted(x, kernel, stride: int = 1):
    """x: (B, D, H, W, C); kernel: (kD, kH, kW, 1, C); 'same' padding k//2.

    Returns (B, ceil(D/stride), ceil(H/stride), ceil(W/stride), C).
    """
    kD, kH, kW = kernel.shape[:3]
    pads = (kD // 2, kH // 2, kW // 2)
    B, D, H, W, C = x.shape
    xp = jnp.pad(
        x, ((0, 0), (pads[0], pads[0]), (pads[1], pads[1]), (pads[2], pads[2]), (0, 0))
    )
    out = None
    for dz in range(kD):
        for dy in range(kH):
            for dx in range(kW):
                sl = xp[:, dz : dz + D : stride, dy : dy + H : stride, dx : dx + W : stride, :]
                term = sl * kernel[dz, dy, dx, 0]
                out = term if out is None else out + term
    return out
