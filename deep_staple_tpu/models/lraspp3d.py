"""MobileNetV3-style 3D LR-ASPP segmentation network, TPU-first.

Capability parity with the reference `deep_staple/MobileNet_LR_ASPP_3D.py`:
  * Backbone of 10 inverted-residual depthwise-separable conv3d blocks with
    channel spec (:171-174); first block's expansion replaced by a full
    3x3x3 stride-2 conv (:149-150); residual when inc==outc and stride 1.
  * ASPP with 1x1 branch, dilated 3x3 branches at rates (2,4,8,16), and a
    global-average-pool branch nearest-upsampled (:58-114); Dropout(0.5).
  * LR-ASPP head: 'low' = ASPP output (128ch @ stride 4), 'high' = first
    block's output (16ch @ stride 2). Note the reference's low/high naming is
    inverted vs torchvision; the wiring here is identical (:21-53, :261-270).
  * Final trilinear (align_corners=False) upsample to the input size (:232).
  * Parameter count 1,228,932 at in=1, classes=2 (gate-tested).

TPU-first design choices (not a port):
  * channels-last NDHWC layout (XLA's native conv layout on TPU),
  * optional bfloat16 compute dtype (instead of CUDA AMP + GradScalers),
  * activation rematerialization via `nn.remat` on the same four segments the
    reference checkpoints (him/lom/aspp/head, :201-222),
  * optional `axis_name` for cross-device synced BatchNorm under pjit.

Weight init matches torch semantics: backbone convs kaiming-normal fan-out
(reference `apply()`, :239-257 — which only touches `self.backbone`); ASPP and
head keep torch's default kaiming-uniform(a=sqrt(5)) + fan-in uniform bias.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv3d import depthwise_conv3d_shifted
from ..ops.conv3d_pallas import depthwise_conv3d_pallas
from ..ops.resample import resize_nd
from .norm import AsyncBatchNorm, SlabBatchNorm

# Backbone channel spec, reference :171-174 (for in_num=1).
MID_CHANNELS = (32, 96, 96, 144, 144, 192, 192, 192, 384, 384)
OUT_CHANNELS = (16, 16, 24, 24, 32, 32, 32, 64, 64, 64)
MID_STRIDE = (1, 1, 1, 1, 1, 1, 2, 1, 1, 1)

# Lower 1x1x1 stride-1 ungrouped convs as explicit dot_general (matmul
# emitter) instead of the XLA conv emitter. Module-level and consulted at
# TRACE time (a flax dataclass field default is frozen at class creation, so
# a class-attribute toggle would be a silent no-op — measured the hard way in
# round 3): probes/tests flip this global and rebuild their jit.
POINTWISE_MATMUL_DEFAULT = False

kaiming_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# torch default conv init: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in)).
torch_default_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_default_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def resolve_depthwise_impl(impl: str) -> str:
    """'auto' -> the measured-fastest depthwise lowering per backend.

    TPU: XLA's grouped conv uses the MXU (15.7 ms/conv at bench scale) and
    beats both the shifted-FMA form (stride-2 taps lower to gather temps) and
    the Pallas VPU stencil — keep 'xla'. CPU: the grouped-conv path runs at
    ~0.08 GFLOP/s (1.5 s for a 4x18^3x96 conv); the 27-FMA 'shift' form with
    its hand-written VJP is 39x faster fwd / 5x bwd and gate-tested equivalent
    within 2e-4 (rounds through f32 accumulation;
    tests/test_models.py::test_depthwise_shift_impl_matches_xla_grouped_conv).
    Resolved at trace time (NOT as a dataclass default — flax class-attribute
    defaults freeze at class creation) so the same module works on both the
    TPU production path and the virtual-mesh CPU test suite.

    Limitation: keys off `jax.default_backend()` (process-wide), not the
    device the computation is placed on — CPU-pinned eval inside a TPU
    process takes the slow grouped-conv path. Perf-only: the impls are
    gate-equivalent numerically.
    """
    if impl != "auto":
        return impl
    return "shift" if jax.default_backend() == "cpu" else "xla"


class _DepthwiseConv3D(nn.Module):
    """Param-compatible replacement for the depthwise nn.Conv (same module
    name 'Conv_0', same kernel shape (k,k,k,1,C)) computing the conv as 27
    shifted VPU FMAs instead of XLA's slow grouped-conv path — see
    ops/conv3d.py."""

    features: int
    kernel: int
    stride: int
    kernel_init: nn.initializers.Initializer
    dtype: Optional[jnp.dtype] = None

    impl: str = "shift"  # 'shift' (ops/conv3d.py) | 'pallas' (ops/conv3d_pallas.py)

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel", self.kernel_init, (self.kernel,) * 3 + (1, self.features), jnp.float32
        )
        if self.impl == "pallas":
            assert self.stride == 1 and self.kernel == 3
            return depthwise_conv3d_pallas(x, k.astype(self.dtype or x.dtype))
        return depthwise_conv3d_shifted(x, k.astype(self.dtype or x.dtype), self.stride)


class _PointwiseConv3D(nn.Module):
    """Param-compatible replacement for 1x1x1 stride-1 nn.Conv (same module
    name 'Conv_0', same kernel shape (1,1,1,Cin,F)) computing the conv as an
    explicit dot, which lowers to the matmul emitter instead of the conv
    emitter.

    VERDICT: off by default (POINTWISE_MATMUL_DEFAULT=False). Isolated-op
    probes (benchmarks/probe_matmul_conv.py) showed cheaper matmul
    transposes (e.g. 144->24 grad 5.3 -> 4.4 ms), but the honest full-step
    A/B (benchmarks/probe_r3_step.py, after fixing a vacuous toggle) showed
    the matmul lowering LOSES ~78 ms/step at every order (fast-int8 686 ->
    765, fast-bf16 799 -> 877): the dot_generals force layout disagreements
    with the neighboring convs (profiler shows 13ms bf16[8,96,96,38,144]
    relayout copies) that outweigh the per-op wins. Kept opt-in as the
    measurement record."""

    features: int
    kernel_init: nn.initializers.Initializer
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.param("kernel", self.kernel_init, (1, 1, 1, cin, self.features), jnp.float32)
        w = k.reshape(cin, self.features).astype(self.dtype or x.dtype)
        return jax.lax.dot_general(
            x, w, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=self.dtype or x.dtype,
        )


class ConvBN(nn.Module):
    """Conv3d (no bias) + BatchNorm + optional activation."""

    features: int
    kernel: int = 1
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    act: Optional[str] = None  # None | 'relu' | 'relu6'
    kernel_init: nn.initializers.Initializer = kaiming_normal_fan_out
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # "auto" backend-resolved (see resolve_depthwise_impl) | "xla" grouped
    # conv | "shift" 27 VPU FMAs (ops/conv3d.py) | "hybrid" shift for
    # stride-1 + xla for stride-2 (stride-2 shifted slices lower to gather
    # temps — the measured pathology of all-"shift" on TPU: 4.2s vs 2.6s step)
    depthwise_impl: str = "auto"
    # 1x1x1 stride-1 ungrouped convs as explicit matmuls (True) or via the
    # XLA conv emitter (False); None = POINTWISE_MATMUL_DEFAULT. Equivalence
    # gate-tested in test_models.
    pointwise_matmul: Optional[bool] = None
    # 'batch' = exact nn.BatchNorm (reference semantics). 'async' =
    # one-step-stale normalization (models/norm.py): breaks the stats ->
    # normalize HBM dependency so XLA fuses both into one read pass (fastest,
    # but stale stats destabilize early training). 'slab' = same-batch stats
    # from a D-strided slab subsample (stable; stats pass shrinks to
    # 1/stride of the volume). Fast-preset bandwidth levers, DP-oracle gated.
    bn_mode: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.dilation * (self.kernel // 2)
        impl = resolve_depthwise_impl(self.depthwise_impl)
        use_own = impl == "shift" or (
            impl in ("hybrid", "pallas") and self.stride == 1
        )
        if self.groups == self.features and self.groups > 1 and use_own:
            assert self.dilation == 1 and x.shape[-1] == self.features
            x = _DepthwiseConv3D(
                self.features, self.kernel, self.stride,
                kernel_init=self.kernel_init, dtype=self.dtype, name="Conv_0",
                impl="pallas" if impl == "pallas" else "shift",
            )(x)
        elif (
            (self.pointwise_matmul if self.pointwise_matmul is not None
             else POINTWISE_MATMUL_DEFAULT)
            and self.kernel == 1 and self.stride == 1 and self.groups == 1
        ):
            x = _PointwiseConv3D(
                self.features, kernel_init=self.kernel_init, dtype=self.dtype,
                name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel,) * 3,
                strides=(self.stride,) * 3,
                padding=[(pad, pad)] * 3,
                kernel_dilation=(self.dilation,) * 3,
                feature_group_count=self.groups,
                use_bias=False,
                kernel_init=self.kernel_init,
                dtype=self.dtype,
            )(x)
        if self.bn_mode in ("async", "slab"):
            # Same param/stat paths as nn.BatchNorm (explicit name) + a
            # 'count' scalar; see models/norm.py for the semantics.
            norm_cls = AsyncBatchNorm if self.bn_mode == "async" else SlabBatchNorm
            x = norm_cls(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name if train else None,
                dtype=self.dtype,
                name="BatchNorm_0",
            )(x)
        else:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name if train else None,
                dtype=self.dtype,
                name="BatchNorm_0",
            )(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "relu6":
            x = nn.relu6(x)
        return x


class InvertedResidual3D(nn.Module):
    """Expand -> depthwise -> project block (reference Backbone_3d :141-154)."""

    midc: int
    outc: int
    stride: int
    first_full_conv: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    depthwise_impl: str = "auto"
    bn_mode: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool):
        inc = x.shape[-1]
        residual = (inc == self.outc) and (self.stride == 1) and not self.first_full_conv
        kw = dict(axis_name=self.axis_name, dtype=self.dtype, bn_mode=self.bn_mode)
        y = x
        if self.first_full_conv:
            # Block 0: full 3x3x3 stride-2 conv replaces the 1x1 expansion (:149-150).
            y = ConvBN(self.midc, kernel=3, stride=2, act="relu6", **kw)(y, train)
        else:
            y = ConvBN(self.midc, kernel=1, act="relu6", **kw)(y, train)
        y = ConvBN(
            self.midc, kernel=3, stride=self.stride, groups=self.midc, act="relu6",
            depthwise_impl=self.depthwise_impl, **kw,
        )(y, train)
        y = ConvBN(self.outc, kernel=1, act=None, **kw)(y, train)
        if residual:
            y = y + x
        return y


class BackboneHigh3D(nn.Module):
    """him_slice: blocks 0-1 of the backbone (reference :201)."""

    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    depthwise_impl: str = "auto"
    bn_mode: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(2):
            x = InvertedResidual3D(
                MID_CHANNELS[i], OUT_CHANNELS[i], int(MID_STRIDE[i]),
                first_full_conv=(i == 0), axis_name=self.axis_name, dtype=self.dtype,
                depthwise_impl=self.depthwise_impl, bn_mode=self.bn_mode,
            )(x, train)
        return x


class BackboneLow3D(nn.Module):
    """lom_slice: blocks 2-9 of the backbone (reference :202)."""

    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    depthwise_impl: str = "auto"
    bn_mode: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(2, 10):
            x = InvertedResidual3D(
                MID_CHANNELS[i], OUT_CHANNELS[i], int(MID_STRIDE[i]),
                axis_name=self.axis_name, dtype=self.dtype,
                depthwise_impl=self.depthwise_impl, bn_mode=self.bn_mode,
            )(x, train)
        return x


class ASPP3D(nn.Module):
    """Atrous spatial pyramid pooling (reference :86-114)."""

    out_channels: int = 128
    atrous_rates: Sequence[int] = (2, 4, 8, 16)
    dropout_rate: float = 0.5
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    bn_mode: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool):
        conv = partial(
            ConvBN, act="relu", kernel_init=torch_default_kernel_init,
            axis_name=self.axis_name, dtype=self.dtype, bn_mode=self.bn_mode,
        )
        branches = [conv(self.out_channels, kernel=1)(x, train)]
        for rate in self.atrous_rates:
            branches.append(conv(self.out_channels, kernel=3, dilation=rate)(x, train))
        # Pooling branch: global mean -> 1x1 conv/BN/relu -> nearest upsample,
        # which for a 1x1x1 source is a broadcast (reference :69-82).
        pooled = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        pooled = conv(self.out_channels, kernel=1)(pooled, train)
        branches.append(jnp.broadcast_to(pooled, x.shape[:-1] + (self.out_channels,)))

        y = jnp.concatenate(branches, axis=-1)
        y = conv(self.out_channels, kernel=1)(y, train)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return y


class LRASPPHead3D(nn.Module):
    """LR-ASPP head (reference :21-53). low: 128ch ASPP out, high: 16ch."""

    num_classes: int
    inter_channels: int = 128
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    bn_mode: str = "batch"

    @nn.compact
    def __call__(self, low, high, train: bool):
        high_channels = high.shape[-1]
        low_channels = low.shape[-1]
        x = ConvBN(
            self.inter_channels, kernel=1, act="relu",
            kernel_init=torch_default_kernel_init, axis_name=self.axis_name,
            dtype=self.dtype, bn_mode=self.bn_mode,
        )(high, train)
        s = jnp.mean(high, axis=(1, 2, 3), keepdims=True)
        s = nn.Conv(
            self.inter_channels, (1, 1, 1), use_bias=False,
            kernel_init=torch_default_kernel_init, dtype=self.dtype,
        )(s)
        x = x * jax.nn.sigmoid(s)
        # Resize the gated high-res features to the low branch's spatial size
        # (a *downsample* — the reference keeps torchvision's inverted naming).
        x = jnp.moveaxis(
            resize_nd(jnp.moveaxis(x, -1, 1), low.shape[1:4], mode="linear", align_corners=False),
            1, -1,
        )
        low_cls = nn.Conv(
            self.num_classes, (1, 1, 1), use_bias=True,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(low_channels), dtype=self.dtype,
        )(low)
        high_cls = nn.Conv(
            self.num_classes, (1, 1, 1), use_bias=True,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(self.inter_channels), dtype=self.dtype,
        )(x)
        return low_cls + high_cls


class ConvHead3D(nn.Module):
    """Plain conv head of the non-LRASPP variant (reference :191-197), applied
    to concat(low, high-resized)."""

    num_classes: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    bn_mode: str = "batch"

    @nn.compact
    def __call__(self, low, high, train: bool):
        high_rs = jnp.moveaxis(
            resize_nd(jnp.moveaxis(high, -1, 1), low.shape[1:4], mode="linear", align_corners=False),
            1, -1,
        )
        x = jnp.concatenate([low, high_rs], axis=-1)
        conv = partial(
            ConvBN, act="relu", kernel_init=torch_default_kernel_init,
            axis_name=self.axis_name, dtype=self.dtype, bn_mode=self.bn_mode,
        )
        x = conv(64, kernel=1)(x, train)
        x = conv(64, kernel=3)(x, train)
        x = nn.Conv(
            self.num_classes, (1, 1, 1), use_bias=True,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(64), dtype=self.dtype,
        )(x)
        return x


class MobileNetLRASPP3D(nn.Module):
    """Full segmentation network. Input (B, D, H, W, C_in); output dict with
    'out': (B, D, H, W, num_classes) logits at input resolution.

    Args:
        num_classes: output classes (including background).
        use_checkpointing: remat the four segments (reference :206-222).
        dtype: compute dtype (bfloat16 recommended on TPU); params stay f32.
        axis_name: mesh axis for synced BatchNorm stats under pjit (None =
            per-device BN like the reference's single-GPU BN).
    """

    num_classes: int = 2
    use_checkpointing: bool = True
    head_type: str = "lraspp"  # 'lraspp' | 'conv'
    dropout_rate: float = 0.5  # ASPP dropout; 0.0 for torch-parity testing
    # 'auto' = 'xla' on TPU ('shift' measured slower on v5e: stride-2 taps
    # lower to gathers, 4.2s vs 2.6s strict step) and 'shift' on CPU, where
    # XLA's grouped conv runs at ~0.08 GFLOP/s vs the 27-FMA form's 39x-fwd/
    # 5x-bwd advantage (see resolve_depthwise_impl).
    depthwise_impl: str = "auto"
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None
    # 'batch' = exact nn.BatchNorm (reference semantics); 'async' = one-step-
    # stale normalization through the running stats; 'slab' = same-batch
    # stats from a D-strided slab subsample (models/norm.py) — fast-preset
    # HBM-bandwidth levers. Param/stat paths stay identical (plus one
    # 'count' scalar per BN in batch_stats).
    bn_mode: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_spatial = x.shape[1:4]
        kw = dict(axis_name=self.axis_name, dtype=self.dtype, bn_mode=self.bn_mode)
        bb_kw = dict(depthwise_impl=self.depthwise_impl, **kw)

        him_cls, lom_cls, aspp_cls = BackboneHigh3D, BackboneLow3D, ASPP3D
        head_cls = LRASPPHead3D if self.head_type == "lraspp" else ConvHead3D
        if self.use_checkpointing:
            # Same remat granularity as the reference's checkpoint() segments.
            him_cls = nn.remat(him_cls, static_argnums=(2,))
            lom_cls = nn.remat(lom_cls, static_argnums=(2,))
            aspp_cls = nn.remat(aspp_cls, static_argnums=(2,))
            head_cls = nn.remat(head_cls, static_argnums=(3,))

        x = x.astype(self.dtype or x.dtype)
        # Explicit names keep parameter paths identical with/without remat.
        high = him_cls(**bb_kw, name="him")(x, train)
        low = lom_cls(**bb_kw, name="lom")(high, train)
        low = aspp_cls(dropout_rate=self.dropout_rate, **kw, name="aspp")(low, train)
        y = head_cls(num_classes=self.num_classes, **kw, name="head")(low, high, train)

        # Final trilinear upsample to input size in f32 (reference :232).
        y = y.astype(jnp.float32)
        y = jnp.moveaxis(
            resize_nd(jnp.moveaxis(y, -1, 1), in_spatial, mode="linear", align_corners=False),
            1, -1,
        )
        return {"out": y}


class MobileNetASPP3D(MobileNetLRASPP3D):
    """Variant with the plain conv head (reference MobileNet_ASPP_3D :160-257)."""

    head_type: str = "conv"
