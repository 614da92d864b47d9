"""2D LR-ASPP MobileNetV3-Large segmentation network (Flax).

Capability parity with the reference's 2D path, which uses torchvision's
`lraspp_mobilenet_v3_large` with the stem conv swapped to accept
`in_channels` (`main_deep_staple.py:386-394` + `set_module`,
`utils/torch_utils.py:334-349`). Here the input-channel count is simply a
constructor argument — no module surgery needed.

Architecture (MobileNetV3-Large, dilated last stage, as in torchvision):
stem 3x3 s2 -> 15 inverted-residual blocks (SE + hardswish per spec) ->
1x1 conv to 960. LR-ASPP head taps 'low' (40ch @ stride 8) and 'high'
(960ch @ stride 16, dilated).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resample import resize_nd
from .lraspp3d import torch_default_kernel_init, torch_default_bias_init, kaiming_normal_fan_out

# (kernel, expanded, out, use_se, activation, stride, dilation)
_V3_LARGE_CFG = [
    (3, 16, 16, False, "relu", 1, 1),
    (3, 64, 24, False, "relu", 2, 1),
    (3, 72, 24, False, "relu", 1, 1),
    (5, 72, 40, True, "relu", 2, 1),
    (5, 120, 40, True, "relu", 1, 1),
    (5, 120, 40, True, "relu", 1, 1),
    (3, 240, 80, False, "hardswish", 2, 1),
    (3, 200, 80, False, "hardswish", 1, 1),
    (3, 184, 80, False, "hardswish", 1, 1),
    (3, 184, 80, False, "hardswish", 1, 1),
    (3, 480, 112, True, "hardswish", 1, 1),
    (3, 672, 112, True, "hardswish", 1, 1),
    # dilated=True in torchvision's lraspp: last stage stride -> dilation 2
    (5, 672, 160, True, "hardswish", 1, 2),
    (5, 960, 160, True, "hardswish", 1, 2),
    (5, 960, 160, True, "hardswish", 1, 2),
]
# torchvision taps 'low' at the OUTPUT of features[4] — the first 40ch block
# (stage_indices[-4] in _segm_lraspp_mobilenetv3), i.e. cfg index 3 here —
# not after the full 40ch stage. Gate: tests/test_torch_parity_2d.py.
_LOW_BLOCK_IDX = 3  # after this block: 40ch @ stride 8 ("low" tap)


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _act(name: str, x):
    if name == "relu":
        return nn.relu(x)
    if name == "hardswish":
        return nn.hard_swish(x)
    raise ValueError(name)


class ConvBN2D(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    act: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.dilation * (self.kernel // 2)
        x = nn.Conv(
            self.features, (self.kernel,) * 2, strides=(self.stride,) * 2,
            padding=[(pad, pad)] * 2, kernel_dilation=(self.dilation,) * 2,
            feature_group_count=self.groups, use_bias=False,
            kernel_init=kaiming_normal_fan_out, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3, dtype=self.dtype)(x)
        if self.act:
            x = _act(self.act, x)
        return x


class SqueezeExcite(nn.Module):
    squeeze_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_channels, (1, 1), use_bias=True, dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype)(s)
        return x * nn.hard_sigmoid(s)


class InvertedResidual2D(nn.Module):
    kernel: int
    expanded: int
    out: int
    use_se: bool
    act: str
    stride: int
    dilation: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        inc = x.shape[-1]
        residual = self.stride == 1 and inc == self.out
        y = x
        if self.expanded != inc:
            y = ConvBN2D(self.expanded, 1, act=self.act, dtype=self.dtype)(y, train)
        y = ConvBN2D(
            self.expanded, self.kernel, stride=self.stride, dilation=self.dilation,
            groups=self.expanded, act=self.act, dtype=self.dtype,
        )(y, train)
        if self.use_se:
            y = SqueezeExcite(_make_divisible(self.expanded // 4), dtype=self.dtype)(y)
        y = ConvBN2D(self.out, 1, act=None, dtype=self.dtype)(y, train)
        if residual:
            y = y + x
        return y


class LRASPPMobileNetV3Large2D(nn.Module):
    """Input (B, H, W, C_in) -> {'out': (B, H, W, num_classes)} logits."""

    num_classes: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_spatial = x.shape[1:3]
        x = x.astype(self.dtype or x.dtype)
        # Stem: the reference swaps this conv to accept in_channels (:391-394).
        y = ConvBN2D(16, 3, stride=2, act="hardswish", dtype=self.dtype)(x, train)
        low = None
        for i, cfg in enumerate(_V3_LARGE_CFG):
            y = InvertedResidual2D(*cfg, dtype=self.dtype)(y, train)
            if i == _LOW_BLOCK_IDX:
                low = y
        high = ConvBN2D(960, 1, act="hardswish", dtype=self.dtype)(y, train)

        # LR-ASPP head (torchvision semantics: cbr(high)*scale upsampled to low).
        cbr = ConvBN2D(128, 1, act="relu", dtype=self.dtype)(high, train)
        s = jnp.mean(high, axis=(1, 2), keepdims=True)
        s = nn.Conv(128, (1, 1), use_bias=False, kernel_init=torch_default_kernel_init, dtype=self.dtype)(s)
        gated = cbr * jax.nn.sigmoid(s)
        gated = jnp.moveaxis(
            resize_nd(jnp.moveaxis(gated, -1, 1), low.shape[1:3], mode="linear", align_corners=False),
            1, -1,
        )
        low_cls = nn.Conv(
            self.num_classes, (1, 1), use_bias=True,
            kernel_init=torch_default_kernel_init, bias_init=torch_default_bias_init(low.shape[-1]),
            dtype=self.dtype,
        )(low)
        high_cls = nn.Conv(
            self.num_classes, (1, 1), use_bias=True,
            kernel_init=torch_default_kernel_init, bias_init=torch_default_bias_init(128),
            dtype=self.dtype,
        )(gated)
        out = (low_cls + high_cls).astype(jnp.float32)
        out = jnp.moveaxis(
            resize_nd(jnp.moveaxis(out, -1, 1), in_spatial, mode="linear", align_corners=False),
            1, -1,
        )
        return {"out": out}
