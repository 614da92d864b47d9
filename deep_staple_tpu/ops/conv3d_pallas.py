"""Pallas TPU kernel for the 3x3x3 depthwise conv3d (stride 1, 'same').

STATUS: measured SLOWER than XLA's grouped conv — kept as an opt-in impl and
an engineering record; do not enable by default.

v5e measurements at (8,96,96,38,144) bf16, state-threaded fori_loop timing
(per-call timings include a ~29ms tunnel dispatch+sync floor — see
benchmarks/probe_dw.py / CLAUDE.md):
  * XLA grouped conv:   15.7 ms/conv — it maps the grouped conv onto the
    MXU, which is ~100x the VPU's f32 throughput;
  * this kernel:        43.9 ms/conv — 27 f32 VPU FMAs per voxel is
    ~20 GFLOP through a ~1 TFLOP/s f32 VPU, a hard ~25-30ms floor that no
    VPU-side restructuring beats. The original motivation (blocks 2-9 at
    573ms) was profiler attribution of the whole blocks, and the per-call
    probe numbers that made the grouped conv look 53ms were floor-inflated.

Compile-friendliness notes that remain useful for future kernels:
  * a VMEM ring buffer with dynamic slot indexing + lagged revisited output
    blocks HANGS the Mosaic compiler;
  * one z-slice per grid step compiles but B*n_ct*D steps of overhead
    dominate; TZ slices per step with halo delivered via two extra
    single-slice refs (block-index maps cannot offset a block by one
    element) amortizes it;
  * z-boundary masks folded into the (C,)-wide weight rows are ~free;
    masking whole planes is not;
  * default scoped VMEM limit is 16MB; raise via
    CompilerParams(vmem_limit_bytes=...) when the working set needs it.

Backward: grad_x for stride 1 is the same stencil with the tap order
reversed (conv with the flipped kernel); grad_w is a second kernel
accumulating the 27 (x * g) tap reductions into a (27, C) f32 block kept
VMEM-resident across all (b, z-tile) steps of a channel tile.

Round-3 probe (benchmarks/probe_gw.py) closed the remaining question: XLA's
autodiff grad_w is ALSO near its floor (12.4 ms/op at 8x96x96x38x144 bf16 vs
a ~2.7 ms HBM bound), but neither the 27-tap XLA multiply-reduce form
(41.6 ms) nor this gw kernel (VPU-bound like the forward) beats it — the
whole depthwise stage (fwd 15.6 + grad_x 10.6 + grad_w 12.4) stays on XLA's
grouped conv, and the Pallas depthwise direction is a recorded dead end.

Round-4 probe (benchmarks/probe_vpu_dw.py) closed the last variant of the
idea: the 27 per-tap minor-dim slices are NOT the bottleneck. Replacing them
with sublane rotates (`pltpu.roll`) + full-padded-width FMAs + one final
interior slice only moves 41.6 -> 37.5 ms, and a border-masked padded-W
layout (no interior slice at all) only reaches 35.4 ms (0.62 eff TFLOP/s).
The stencil is VPU *issue*-bound: rotate + mul + add are ~3 vector ops per
tap-element against the v5e VPU's ~3.9 G-elem-ops/s, so ~2.8 ms of pure FMA
becomes a hard ~30 ms of issue slots, vs XLA's MXU-based grouped conv at
13.4 ms. (`pltpu.roll` also refuses bf16 operands: "Rotate with non-32-bit
data".) Consequence recorded in VERDICT-r3 terms: a fused inverted-residual
block kernel (expand MXU -> dw -> project MXU in VMEM) cannot win — its
depthwise stage alone would cost more than XLA's entire per-op block chain
(26.9 ms measured fwd for block 5), so the fusion lever is rejected with
measurements, not skipped.

Numerics: taps accumulate in f32; bit-exact vs the XLA grouped conv at
bench shapes (measured max|diff| = 0.0); gated in tests/test_models.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_tz(D: int) -> int:
    for tz in (8, 6, 4, 3, 2):
        if D % tz == 0:
            return tz
    return 1


def _slab_f32(lo_ref, main_ref, hi_ref):
    slab = jnp.concatenate(
        [lo_ref[...], main_ref[...], hi_ref[...]], axis=0
    ).astype(jnp.float32)
    return jnp.pad(slab, ((0, 0), (1, 1), (1, 1), (0, 0)))


def _fwd_kernel(lo_ref, main_ref, hi_ref, w_ref, o_ref, *, TZ: int, H: int, W: int):
    t = pl.program_id(2)
    nT = pl.num_programs(2)
    f32 = jnp.float32
    lo_ok = (t > 0).astype(f32)
    hi_ok = (t < nT - 1).astype(f32)
    slab = _slab_f32(lo_ref, main_ref, hi_ref)  # (TZ+2, H+2, W+2, ct) f32
    for z in range(TZ):
        acc = jnp.zeros((H, W, o_ref.shape[-1]), f32)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    w_row = w_ref[dz * 9 + dy * 3 + dx, :]
                    if z == 0 and dz == 0:
                        w_row = w_row * lo_ok
                    elif z == TZ - 1 and dz == 2:
                        w_row = w_row * hi_ok
                    acc = acc + slab[z + dz, dy : dy + H, dx : dx + W, :] * w_row
        o_ref[z] = acc.astype(o_ref.dtype)


def _specs(D, TZ, H, W, ct, order):
    """Input specs for (lo, main, hi) + the (27, ct) weight row block.

    order='bcz': grid (B, n_ct, n_t); order='cbz': grid (n_ct, B, n_t).
    """

    def pick(b, c, t):
        return (b, c, t)

    def pick_cb(c, b, t):
        return (b, c, t)

    sel = pick if order == "bcz" else pick_cb

    def lo(*ids):
        b, c, t = sel(*ids)
        return (b * D + jnp.clip(t * TZ - 1, 0, D - 1), 0, 0, c)

    def main(*ids):
        b, c, t = sel(*ids)
        return (b * (D // TZ) + t, 0, 0, c)

    def hi(*ids):
        b, c, t = sel(*ids)
        return (b * D + jnp.clip(t * TZ + TZ, 0, D - 1), 0, 0, c)

    def wmap(*ids):
        b, c, t = sel(*ids)
        return (0, c)

    return [
        pl.BlockSpec((1, H, W, ct), lo),
        pl.BlockSpec((TZ, H, W, ct), main),
        pl.BlockSpec((1, H, W, ct), hi),
        pl.BlockSpec((27, ct), wmap),
    ]


def _dw_pallas_fwd_impl(x, w27, flip: bool):
    B, D, H, W, C = x.shape
    ct = min(C, 128)
    n_ct = -(-C // ct)
    TZ = _pick_tz(D)
    if flip:
        w27 = w27[::-1]
    xf = x.reshape(B * D, H, W, C)

    kern = partial(_fwd_kernel, TZ=TZ, H=H, W=W)
    out = pl.pallas_call(
        kern,
        grid=(B, n_ct, D // TZ),
        in_specs=_specs(D, TZ, H, W, ct, "bcz"),
        out_specs=pl.BlockSpec(
            (TZ, H, W, ct), lambda b, c, t: (b * (D // TZ) + t, 0, 0, c)
        ),
        out_shape=jax.ShapeDtypeStruct((B * D, H, W, C), x.dtype),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xf, xf, xf, w27)
    return out.reshape(B, D, H, W, C)


def _gw_kernel(lo_ref, main_ref, hi_ref, g_ref, o_ref, *, TZ: int, H: int, W: int):
    c = pl.program_id(0)
    b = pl.program_id(1)
    t = pl.program_id(2)
    nT = pl.num_programs(2)
    f32 = jnp.float32

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _init_out():
        o_ref[...] = jnp.zeros_like(o_ref)

    lo_ok = (t > 0).astype(f32)
    hi_ok = (t < nT - 1).astype(f32)
    slab = _slab_f32(lo_ref, main_ref, hi_ref)
    g = g_ref[...].astype(f32)  # (TZ, H, W, ct)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                part = jnp.zeros((o_ref.shape[-1],), f32)
                for z in range(TZ):
                    gz = g[z]
                    if z == 0 and dz == 0:
                        gz = gz * lo_ok
                    elif z == TZ - 1 and dz == 2:
                        gz = gz * hi_ok
                    part = part + jnp.sum(
                        slab[z + dz, dy : dy + H, dx : dx + W, :] * gz, axis=(0, 1)
                    )
                i = dz * 9 + dy * 3 + dx
                o_ref[i, :] = o_ref[i, :] + part


def _dw_pallas_gw_impl(x, g):
    B, D, H, W, C = x.shape
    ct = min(C, 128)
    n_ct = -(-C // ct)
    TZ = _pick_tz(D)
    # Scoped-VMEM guard: the f32 slab (TZ+2, H+2, W+2, ct) + f32 cotangent
    # block + double-buffered bf16 input blocks must fit the 100MB limit
    # (measured overflow at TZ=8, 96x38x128: 100.28M — benchmarks/probe_gw.py).
    def _vmem_est(tz):
        slab = (tz + 2) * (H + 2) * (W + 2) * ct * 4
        gblk = tz * H * W * ct * 4
        bufs = 2 * (tz + 2 + tz) * H * W * ct * x.dtype.itemsize  # 2x: double-buffered
        return slab + gblk + bufs

    while TZ > 1 and _vmem_est(TZ) > 80 * 1024 * 1024:
        TZ = max(t for t in range(1, TZ) if D % t == 0)
    xf = x.reshape(B * D, H, W, C)
    gf = g.reshape(B * D, H, W, C)

    specs = _specs(D, TZ, H, W, ct, "cbz")
    specs.pop()  # weight row block unused in gw
    specs.append(
        pl.BlockSpec((TZ, H, W, ct), lambda c, b, t: (b * (D // TZ) + t, 0, 0, c))
    )
    kern = partial(_gw_kernel, TZ=TZ, H=H, W=W)
    return pl.pallas_call(
        kern,
        grid=(n_ct, B, D // TZ),
        in_specs=specs,
        out_specs=pl.BlockSpec((27, ct), lambda c, b, t: (0, c)),
        out_shape=jax.ShapeDtypeStruct((27, C), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(xf, xf, xf, gf)


@jax.custom_vjp
def depthwise_conv3d_pallas(x, kernel):
    """Depthwise 3x3x3 conv, stride 1, 'same' padding, channels-last.

    x: (B, D, H, W, C); kernel: (3, 3, 3, 1, C) — the exact parameter layout
    of `nn.Conv(features=C, kernel=(3,3,3), feature_group_count=C)`, so the
    impl is swappable without touching checkpoints.

    The mask logic in the kernels zeroes the z-halo taps at volume edges;
    note the gw kernel masks the *cotangent* slice for the same (z, dz)
    pairs, which is equivalent because the masked tap pairs are identical.
    """
    w27 = kernel.reshape(27, kernel.shape[-1]).astype(jnp.float32)
    return _dw_pallas_fwd_impl(x, w27, flip=False)


def _vjp_fwd(x, kernel):
    return depthwise_conv3d_pallas(x, kernel), (x, kernel)


def _vjp_bwd(res, g):
    x, kernel = res
    w27 = kernel.reshape(27, kernel.shape[-1]).astype(jnp.float32)
    gx = _dw_pallas_fwd_impl(g, w27, flip=True)
    gw = _dw_pallas_gw_impl(x, g)
    return gx.astype(x.dtype), gw.reshape(kernel.shape).astype(kernel.dtype)


depthwise_conv3d_pallas.defvjp(_vjp_fwd, _vjp_bwd)
