"""From-scratch torch restatement of the reference's 2D model for parity gates.

The reference's 2D path IS torchvision's ``lraspp_mobilenet_v3_large`` with
the stem conv swapped to accept ``in_channels`` (``main_deep_staple.py:386-394``
via ``set_module``, ``utils/torch_utils.py:334-349``). torchvision is not in
this image, so this module restates the architecture (MobileNetV3-Large,
dilated last stage, LR-ASPP head) with torchvision's exact ``state_dict`` key
layout — ``backbone.<idx>.block.<j>.<k>.*`` / ``classifier.*`` — so real
torchvision checkpoints transplant unmodified. It is an independent
restatement (like ``torch_reference_step.TorchLRASPP3D`` for the 3D path),
used by ``tests/test_torch_parity_2d.py`` to cross-check the Flax
``LRASPPMobileNetV3Large2D``.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

# (kernel, expanded, out, use_se, activation, configured_stride, dilation) —
# torchvision _mobilenet_v3_conf("mobilenet_v3_large", dilated=True); the
# configured stride 2 of the first dilated block is forced to 1 at build time.
V3_LARGE_CFG = [
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
    (5, 672, 160, True, "hardswish", 2, 2),
    (5, 960, 160, True, "hardswish", 1, 2),
    (5, 960, 160, True, "hardswish", 1, 2),
]
LOW_POS, HIGH_POS = 4, 16  # stage_indices[-4] / [-1] of the dilated build


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _act(name: str) -> nn.Module:
    return nn.ReLU(inplace=True) if name == "relu" else nn.Hardswish(inplace=True)


def _cbn(cin, cout, k=1, stride=1, dilation=1, groups=1, act="hardswish"):
    pad = (k // 2) * dilation
    layers = [
        nn.Conv2d(cin, cout, k, stride, pad, dilation, groups, bias=False),
        nn.BatchNorm2d(cout, eps=0.001, momentum=0.01),
    ]
    if act is not None:
        layers.append(_act(act))
    return nn.Sequential(*layers)


class _SE(nn.Module):
    # torchvision SqueezeExcitation key layout: fc1/fc2 convs with bias.
    def __init__(self, c: int, squeeze: int):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(c, squeeze, 1)
        self.activation = nn.ReLU()
        self.fc2 = nn.Conv2d(squeeze, c, 1)
        self.scale_activation = nn.Hardsigmoid()

    def forward(self, x):
        s = self.fc2(self.activation(self.fc1(self.avgpool(x))))
        return x * self.scale_activation(s)


class _InvRes(nn.Module):
    def __init__(self, cin, kernel, expanded, out, use_se, act, stride, dilation):
        super().__init__()
        self.use_res = stride == 1 and cin == out
        stride = 1 if dilation > 1 else stride
        layers = []
        if expanded != cin:
            layers.append(_cbn(cin, expanded, 1, act=act))
        layers.append(_cbn(expanded, expanded, kernel, stride, dilation, expanded, act))
        if use_se:
            layers.append(_SE(expanded, _make_divisible(expanded // 4)))
        layers.append(_cbn(expanded, out, 1, act=None))
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


class _LRASPPHead(nn.Module):
    def __init__(self, low_channels, high_channels, num_classes, inter_channels=128):
        super().__init__()
        self.cbr = nn.Sequential(
            nn.Conv2d(high_channels, inter_channels, 1, bias=False),
            nn.BatchNorm2d(inter_channels),
            nn.ReLU(inplace=True),
        )
        self.scale = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(high_channels, inter_channels, 1, bias=False),
            nn.Sigmoid(),
        )
        self.low_classifier = nn.Conv2d(low_channels, num_classes, 1)
        self.high_classifier = nn.Conv2d(inter_channels, num_classes, 1)

    def forward(self, low, high):
        x = self.cbr(high) * self.scale(high)
        x = F.interpolate(x, size=low.shape[-2:], mode="bilinear", align_corners=False)
        return self.low_classifier(low) + self.high_classifier(x)


class TorchLRASPP2D(nn.Module):
    """torchvision-key-compatible LRASPP MobileNetV3-Large, stem swapped to
    ``in_channels`` exactly as the reference does (main_deep_staple.py:391-394:
    only the conv is replaced; its BN/activation stay)."""

    def __init__(self, in_channels: int = 1, num_classes: int = 2):
        super().__init__()
        feats = [_cbn(in_channels, 16, 3, stride=2, act="hardswish")]
        cin = 16
        for kernel, expanded, out, use_se, act, stride, dilation in V3_LARGE_CFG:
            feats.append(_InvRes(cin, kernel, expanded, out, use_se, act, stride, dilation))
            cin = out
        feats.append(_cbn(cin, 960, 1, act="hardswish"))
        # ModuleDict with string indices reproduces IntermediateLayerGetter's
        # 'backbone.<idx>.*' key layout.
        self.backbone = nn.ModuleDict({str(i): m for i, m in enumerate(feats)})
        self.classifier = _LRASPPHead(40, 960, num_classes)

    def forward(self, x):
        size = x.shape[-2:]
        low = high = None
        y = x
        for i in range(HIGH_POS + 1):
            y = self.backbone[str(i)](y)
            if i == LOW_POS:
                low = y
        high = y
        out = self.classifier(low, high)
        return F.interpolate(out, size=size, mode="bilinear", align_corners=False)
