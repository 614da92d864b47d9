"""Device-side, PRNG-keyed augmentation engine.

Re-implements the reference's augmentation pipeline
(`deep_staple/utils/torch_utils.py:94-251`, used from
`HybridIdLoader.py:482-505`) as pure JAX so it runs *inside* the jitted train
step on TPU instead of per-sample on the host:

  1. additive Gaussian noise on the image (`augmentNoise`, :94-95),
  2. optional pre-interpolation (x1.5 train / x2.0 eval),
  3. a random b-spline displacement field: random control points smoothed by
     three stride-1 3x3(x3) average pools (count_include_pad=True), upsampled
     (bi/tri)linear align_corners=True (:147-165 / :190-209),
  4. a random affine displacement via `affine_grid` (:167-176 / :211-227),
  5. one composed `grid_sample` warp — image (bi/tri)linear with border
     padding, labels nearest with zeros padding (:232-246). The same grid is
     reused for the clean label and the modified label
     (`HybridIdLoader.py:325-333`).

Differences from the reference (intentional, jit-compatible):
  * Bernoulli decisions (bspline/affine probability) are traced: both
    displacement branches are computed and masked by the coin flips, so the
    step compiles once. XLA DCEs nothing, but the field computation is tiny
    relative to the warp itself.
  * Randomness comes from `jax.random` keys rather than global torch state.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .grid_sample import affine_grid_2d, affine_grid_3d, grid_sample_2d, grid_sample_3d
from .resample import interpolate_sample, resize_nd

_KERNEL_SIZE = 3


class AugmentParams(NamedTuple):
    """Hyperparameters of `HybridIdLoader.augment` (`HybridIdLoader.py:482-487`)."""

    noise_strength: float = 0.05
    bspline_num_ctl_points: int = 6
    bspline_strength: float = 0.03
    bspline_probability: float = 0.95
    affine_strength: float = 0.2
    add_affine_translation: float = 0.0
    affine_probability: float = 0.45


def augment_noise(key, b_image, strength: float = 0.05):
    """`augmentNoise` (`torch_utils.py:94-95`)."""
    return b_image + strength * jax.random.normal(key, b_image.shape, b_image.dtype)


def _avg_pool_same(x, ndim: int):
    """Stride-1 'same' average pooling with zero padding counted in the mean
    (torch AvgPool default count_include_pad=True)."""
    window = (1, 1) + (_KERNEL_SIZE,) * ndim
    pad = ((0, 0), (0, 0)) + ((_KERNEL_SIZE // 2, _KERNEL_SIZE // 2),) * ndim
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, (1,) * (ndim + 2), pad)
    return summed / float(_KERNEL_SIZE**ndim)


def _bspline_ctl_3d(key, B, num_ctl: int, strength: float, strength_spatial):
    """Smoothed + scaled control field of the 3D b-spline displacement.

    Reference quirk kept verbatim: channel i is scaled by (D, H, W)[i] even
    though the grid's last-dim order is (x=W, y=H, z=D) (`torch_utils.py:196-209`).
    strength_spatial lets the fast augment path evaluate the grid at base
    resolution while keeping the field-magnitude distribution of the
    post-interpolation resolution.
    """
    sD, sH, sW = strength_spatial
    ctl = jax.random.normal(key, (B, 3, num_ctl, num_ctl, num_ctl), jnp.float32)
    dim_strength = jnp.array([sD, sH, sW], jnp.float32) * strength
    ctl = ctl * dim_strength.reshape(1, 3, 1, 1, 1)
    for _ in range(3):
        ctl = _avg_pool_same(ctl, 3)
    return ctl


def _bspline_field_from_ctl(ctl, spatial):
    """Sample the control field's piecewise-trilinear interpolant on the full
    lattice: (B, 3, n, n, n) -> (B, D, H, W, 3)."""
    disp = resize_nd(ctl, tuple(spatial), mode="linear", align_corners=True)
    return jnp.transpose(disp, (0, 2, 3, 4, 1))


def _bspline_field_3d(key, B, spatial, num_ctl: int, strength: float, strength_spatial=None):
    ctl = _bspline_ctl_3d(key, B, num_ctl, strength, strength_spatial or spatial)
    return _bspline_field_from_ctl(ctl, spatial)  # (B, D, H, W, 3)


def _bspline_field_2d(key, B, spatial, num_ctl: int, strength: float):
    H, W = spatial
    ctl = jax.random.normal(key, (B, 2, num_ctl, num_ctl), jnp.float32)
    # Extra *.5 factor in 2D to match 3D strength (`torch_utils.py:153-154`).
    dim_strength = jnp.array([H, W], jnp.float32) * strength * 0.5
    ctl = ctl * dim_strength.reshape(1, 2, 1, 1)
    for _ in range(3):
        ctl = _avg_pool_same(ctl, 2)
    disp = resize_nd(ctl, (H, W), mode="linear", align_corners=True)
    return jnp.transpose(disp, (0, 2, 3, 1))


def make_augment_grid(
    key,
    batch: int,
    spatial,
    params: AugmentParams,
    use_2d: bool = False,
    strength_spatial=None,
):
    """Build the composed random warp grid (identity + bspline + affine).

    The reference augments each sample in its own `spatial_augment` call
    (`HybridIdLoader.py:325-333`), so coin flips and translation directions
    here are drawn *per sample* ((B,)-shaped), vectorizing that behavior.
    """
    k_coin_b, k_coin_a, k_bspline, k_affine, k_dir = jax.random.split(key, 5)
    do_bspline = (
        jax.random.uniform(k_coin_b, (batch,)) < params.bspline_probability
    ).astype(jnp.float32)
    do_affine = (
        jax.random.uniform(k_coin_a, (batch,)) < params.affine_probability
    ).astype(jnp.float32)

    # HBM note: id_grid + coin_a*(affine_grid(theta) - id_grid) ==
    # affine_grid(eye + coin_a*(theta - eye)) because affine_grid is linear in
    # theta — so only ONE full-resolution grid tensor is ever materialized
    # (plus the b-spline field), instead of three.
    if use_2d:
        H, W = spatial
        eye = jnp.broadcast_to(jnp.eye(2, 3, dtype=jnp.float32), (batch, 2, 3))
        bspline = _bspline_field_2d(
            k_bspline, batch, (H, W), params.bspline_num_ctl_points, params.bspline_strength
        )
        theta = eye + params.affine_strength * jax.random.normal(k_affine, (batch, 2, 3), jnp.float32)
        alpha = jax.random.uniform(k_dir, (batch,)) * 2 * jnp.pi
        offset = jnp.stack([jnp.cos(alpha), jnp.sin(alpha)], axis=-1)
        theta = theta.at[:, :, -1].set(params.add_affine_translation * offset)
        eff_theta = eye + do_affine[:, None, None] * (theta - eye)
        grid = affine_grid_2d(eff_theta, (H, W), align_corners=False)
        return grid + do_bspline.reshape(batch, 1, 1, 1) * bspline

    D, H, W = spatial
    eff_theta, ctl, do_bspline3 = _parts_3d(
        do_bspline, do_affine, k_bspline, k_affine, k_dir, batch, params,
        strength_spatial or spatial,
    )
    bspline = _bspline_field_from_ctl(ctl, (D, H, W))
    grid = affine_grid_3d(eff_theta, (D, H, W), align_corners=False)
    return grid + do_bspline3.reshape(batch, 1, 1, 1, 1) * bspline


def _parts_3d(do_bspline, do_affine, k_bspline, k_affine, k_dir, batch, params, strength_spatial):
    eye = jnp.broadcast_to(jnp.eye(3, 4, dtype=jnp.float32), (batch, 3, 4))
    ctl = _bspline_ctl_3d(
        k_bspline, batch, params.bspline_num_ctl_points, params.bspline_strength,
        strength_spatial,
    )
    theta = eye + params.affine_strength * jax.random.normal(k_affine, (batch, 3, 4), jnp.float32)
    angles = jax.random.uniform(k_dir, (batch, 2)) * 2 * jnp.pi
    t_ang, phi = angles[:, 0], angles[:, 1]
    offset = jnp.stack(
        [jnp.cos(phi) * jnp.sin(t_ang), jnp.sin(phi) * jnp.sin(t_ang), jnp.cos(t_ang)], axis=-1
    )
    theta = theta.at[:, :, -1].set(params.add_affine_translation * offset)
    eff_theta = eye + do_affine[:, None, None] * (theta - eye)
    return eff_theta, ctl, do_bspline


def make_augment_parts(key, batch: int, spatial, params: AugmentParams, strength_spatial=None):
    """The 3D warp's parts, with both coins folded in: (eff_theta, ctl).

    eff_theta (B, 3, 4) is the effective affine (identity where the affine
    coin is off); ctl (B, 3, n, n, n) the smoothed+scaled b-spline control
    field ZEROED where the b-spline coin is off. The joint grid assembles as
    `affine_grid_3d(eff_theta) + _bspline_field_from_ctl(ctl, spatial)` —
    identical (by linearity of the resize) to `make_augment_grid` under the
    same key; the separable warp (`ops/sep_warp.py`) consumes the parts
    directly."""
    k_coin_b, k_coin_a, k_bspline, k_affine, k_dir = jax.random.split(key, 5)
    do_bspline = (
        jax.random.uniform(k_coin_b, (batch,)) < params.bspline_probability
    ).astype(jnp.float32)
    do_affine = (
        jax.random.uniform(k_coin_a, (batch,)) < params.affine_probability
    ).astype(jnp.float32)
    eff_theta, ctl, do_bspline = _parts_3d(
        do_bspline, do_affine, k_bspline, k_affine, k_dir, batch, params,
        strength_spatial or spatial,
    )
    return eff_theta, ctl * do_bspline.reshape(batch, 1, 1, 1, 1)


def _unnormalize_ac_false(coord, size: int):
    return ((coord + 1.0) * size - 1.0) / 2.0


def _warp_corner_coords(vol, grid, pair_x: bool, pair_y: bool = False):
    """Shared warp preamble: unnormalize + clamp the grid, split into corner
    base indices and fractional weights.

    pair_x=True clamps x0 to W-2 with wx in [0, 1] so the (x0, x0+1) pair
    never crosses a row (exact border semantics — at x == W-1 the weight
    moves fully onto the high corner); pair_x=False keeps x0 in [0, W-1]
    (corners clamp per-tap instead). pair_y does the same for y0/H (used by
    the quad-packed warp whose gather word spans a 2x2 (x, y) footprint).
    Returns (x0, y0, z0, wx, wy, wz, out_spatial) with index/weight arrays
    flattened to (B, P).
    """
    B, D, H, W = vol.shape
    out_spatial = grid.shape[1:-1]
    P = int(np.prod(out_spatial))
    x = jnp.clip(_unnormalize_ac_false(grid[..., 0], W), 0, W - 1).reshape(B, P)
    y = jnp.clip(_unnormalize_ac_false(grid[..., 1], H), 0, H - 1).reshape(B, P)
    z = jnp.clip(_unnormalize_ac_false(grid[..., 2], D), 0, D - 1).reshape(B, P)
    x0 = jnp.floor(x).astype(jnp.int32)
    if pair_x:
        x0 = jnp.minimum(x0, max(W - 2, 0))
    y0 = jnp.floor(y).astype(jnp.int32)
    if pair_y:
        y0 = jnp.minimum(y0, max(H - 2, 0))
    z0 = jnp.floor(z).astype(jnp.int32)
    return x0, y0, z0, x - x0, y - y0, z - z0, out_spatial


def _warp_trilinear_border(vol, grid):
    """Exact trilinear warp, padding_mode='border', align_corners=False.

    vol: (B, D, H, W) f32; grid: (B, D', H', W', 3) of (x, y, z).

    Eight flattened element gathers — the measured optimum for EXACT f32
    semantics on this chip (see the probed-dead-ends comment below and
    benchmarks/probe_gather.py / probe_warp.py). Numerics identical to
    `grid_sample_3d(..., 'bilinear', 'border')` (coordinates pre-clamped so
    x0 in [0, W-1] always); gate-tested in tests/test_fast_warp.py.
    """
    B, D, H, W = vol.shape
    x0, y0, z0, wx, wy, wz, out_spatial = _warp_corner_coords(vol, grid, pair_x=False)

    # Plain flattened element gathers — the measured optimum. The TPU gather
    # is scalar-unit issue-bound (~145M idx/s probed on v5e, independent of
    # index coherence; benchmarks/probe_gather.py). Probed dead ends, for the
    # record: (a) complex64 pair-packing (both x-corners per word) is 3x
    # slower per word — wide gather words cost per-byte; (b) one lax.gather
    # with slice_sizes (2,2,2) fetching the whole corner cube per index is
    # layout-doomed — XLA canonicalizes gather outputs with slice dims minor,
    # f32[P,2,2,2]{T(2,128)} pads 64x = 45GB at bench scale, regardless of
    # offset_dims order; (c) Mosaic tpu.dynamic_gather compiles only for
    # <=8-row blocks (axis 0) or lane-local indices (axis 1), so no Pallas
    # kernel can express the arbitrary (row, lane) access of a spatial warp.
    # This gather wall is why the 'fast' augment order (3.4x fewer gathered
    # voxels) exists.
    vf = vol.reshape(B, D * H * W)
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                lin = (
                    jnp.minimum(z0 + dz, D - 1) * H + jnp.minimum(y0 + dy, H - 1)
                ) * W + jnp.minimum(x0 + dx, W - 1)
                v = jnp.take_along_axis(vf, lin, axis=1)
                w = (
                    (wx if dx else 1 - wx)
                    * (wy if dy else 1 - wy)
                    * (wz if dz else 1 - wz)
                )
                out = out + v * w
    return out.reshape((B,) + out_spatial)


def _warp_trilinear_border_bf16pack(vol, grid):
    """Trilinear warp with both x-corners packed as bf16 halves of one
    32-bit gather word: 4 gathers instead of 8.

    The TPU gather is per-index issue-bound (~145M idx/s regardless of
    element width up to 32 bits — benchmarks/probe_gather.py), so halving
    the index count halves the dominant warp cost. Values round through
    bfloat16 (~0.4% relative) — an order of magnitude below the
    augmentation pipeline's own additive noise (strength 0.05,
    `torch_utils.py:94-95`), so the augmentation distribution is unchanged.
    Used by augment order 'fast-bf16'; the exact path is
    `_warp_trilinear_border`.
    """
    B, D, H, W = vol.shape
    x0, y0, z0, wx, wy, wz, out_spatial = _warp_corner_coords(vol, grid, pair_x=True)

    v16 = jax.lax.bitcast_convert_type(vol.astype(jnp.bfloat16), jnp.uint16)
    nxt = jnp.concatenate([v16[..., 1:], v16[..., -1:]], axis=-1)
    packed = (v16.astype(jnp.uint32) << 16) | nxt.astype(jnp.uint32)
    pf = packed.reshape(B, D * H * W)

    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            lin = (
                jnp.minimum(z0 + dz, D - 1) * H + jnp.minimum(y0 + dy, H - 1)
            ) * W + x0
            word = jnp.take_along_axis(pf, lin, axis=1)
            v0 = jax.lax.bitcast_convert_type(
                (word >> 16).astype(jnp.uint16), jnp.bfloat16
            ).astype(jnp.float32)
            v1 = jax.lax.bitcast_convert_type(
                (word & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
            ).astype(jnp.float32)
            v = v0 * (1 - wx) + v1 * wx
            out = out + v * ((wy if dy else 1 - wy) * (wz if dz else 1 - wz))
    return out.reshape((B,) + out_spatial)


def _warp_trilinear_border_int8pack(vol, grid):
    """Trilinear warp with the full 2x2 in-plane corner quad packed as four
    int8 quanta in one 32-bit gather word: 2 gathers (z0, z1) instead of 8.

    The TPU gather is per-index issue-bound (~145M idx/s regardless of word
    width up to 32 bits — benchmarks/probe_gather.py), so quartering the
    image index count quarters the dominant warp cost. Values quantize to
    int8 on a per-sample absmax scale: quantization step = absmax/127, i.e.
    ~1% of a z-normalized MRI's range — several times below the augmentation
    pipeline's own additive Gaussian noise (strength 0.05 of unit variance,
    `torch_utils.py:94-95`), and dithered by that noise since packing happens
    after noise injection. Used by augment orders '{fast,reference}-int8';
    exact-f32 and bf16 paths remain available.
    """
    B, D, H, W = vol.shape
    x0, y0, z0, wx, wy, wz, out_spatial = _warp_corner_coords(
        vol, grid, pair_x=True, pair_y=True
    )

    scale = jnp.max(jnp.abs(vol.reshape(B, -1)), axis=1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(vol.reshape(B, -1) / scale), -127, 127).reshape(vol.shape)
    q = q.astype(jnp.int32) & 0xFF
    # Neighbor shifts with edge replication (border padding semantics).
    qx = jnp.concatenate([q[..., 1:], q[..., -1:]], axis=-1)  # (x+1)
    qy = jnp.concatenate([q[:, :, 1:], q[:, :, -1:]], axis=2)  # (y+1)
    qxy = jnp.concatenate([qx[:, :, 1:], qx[:, :, -1:]], axis=2)  # (x+1, y+1)
    packed = (q | (qx << 8) | (qy << 16) | (qxy << 24)).astype(jnp.uint32)
    pf = packed.reshape(B, D * H * W)

    def unpack(word, shift):
        b = (word >> shift).astype(jnp.uint8)
        return jax.lax.bitcast_convert_type(b, jnp.int8).astype(jnp.float32)

    out = 0.0
    for dz in (0, 1):
        lin = (jnp.minimum(z0 + dz, D - 1) * H + y0) * W + x0
        word = jnp.take_along_axis(pf, lin, axis=1)
        v00 = unpack(word, 0)
        v10 = unpack(word, 8)
        v01 = unpack(word, 16)
        v11 = unpack(word, 24)
        v = (1 - wy) * ((1 - wx) * v00 + wx * v10) + wy * ((1 - wx) * v01 + wx * v11)
        out = out + v * (wz if dz else 1 - wz)
    return (out * scale).reshape((B,) + out_spatial)


def _warp_fused_int6pack(vol, lbl, mod, grid):
    """Fully fused warp of image + BOTH binary labels: 2 gathers total.

    Word layout (32 bits per voxel): the 2x2 in-plane image corner quad as
    four int6 quanta (bits 0..23) plus the same corner quad's label codes
    (label | modified<<1, 2 bits each, bits 24..31). One gather per z corner
    (z0, z1) fetches everything: image trilinear/border AND both labels
    nearest/zeros ride the same two index streams — the TPU gather is
    per-index issue-bound (benchmarks/probe_gather.py), so this is 2/3 the
    warp cost of '{fast,reference}-int8' (which needs a third gather for the
    packed labels).

    Image quantization step = absmax/31 (~3.2% of absmax). Callers using the
    'int6' augment orders compensate by shrinking the pipeline's own additive
    Gaussian noise so the TOTAL perturbation variance stays at the configured
    strength (`augment_sample_pair`). Labels must be binary {0, 1} (the
    CrossMoDa operating point, `CrossmodaHybridIdLoader.py:199-200`); the
    nearest/zeros label semantics match `_warp_nearest_zeros` exactly.

    Returns (image, label, modified_label) at the grid's output shape.
    """
    B, D, H, W = vol.shape
    x0, y0, z0, wx, wy, wz, out_spatial = _warp_corner_coords(
        vol, grid, pair_x=True, pair_y=True
    )

    scale = jnp.max(jnp.abs(vol.reshape(B, -1)), axis=1, keepdims=True) / 31.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(vol.reshape(B, -1) / scale), -31, 31).reshape(vol.shape)
    q = q.astype(jnp.int32) & 0x3F
    code = (lbl + 2 * mod).astype(jnp.int32)  # 2-bit label code per voxel

    def shifts(a):
        ax = jnp.concatenate([a[..., 1:], a[..., -1:]], axis=-1)  # (x+1)
        ay = jnp.concatenate([a[:, :, 1:], a[:, :, -1:]], axis=2)  # (y+1)
        axy = jnp.concatenate([ax[:, :, 1:], ax[:, :, -1:]], axis=2)  # (x+1, y+1)
        return ax, ay, axy

    qx, qy, qxy = shifts(q)
    cx, cy, cxy = shifts(code)
    packed = (
        q | (qx << 6) | (qy << 12) | (qxy << 18)
        | (code << 24) | (cx << 26) | (cy << 28) | (cxy << 30)
    ).astype(jnp.uint32)
    pf = packed.reshape(B, D * H * W)

    def unpack_int6(word, shift):
        b = ((word >> shift) & 0x3F).astype(jnp.int32)
        return ((b ^ 0x20) - 0x20).astype(jnp.float32)  # 6-bit sign extension

    # Nearest-corner selection for labels: round() exactly as
    # `_warp_nearest_zeros` (incl. its half-to-even ties), expressed relative
    # to the pair-clamped base corner so it rides the same gathered words.
    xr = jnp.clip(_unnormalize_ac_false(grid[..., 0], W), 0, W - 1).reshape(x0.shape)
    yr = jnp.clip(_unnormalize_ac_false(grid[..., 1], H), 0, H - 1).reshape(y0.shape)
    zr = jnp.clip(_unnormalize_ac_false(grid[..., 2], D), 0, D - 1).reshape(z0.shape)
    sel_x = jnp.round(xr).astype(jnp.int32) - x0  # 0 or 1
    sel_y = jnp.round(yr).astype(jnp.int32) - y0
    sel_z = jnp.round(zr).astype(jnp.int32) - z0
    lbl_shift = (24 + 2 * sel_x + 4 * sel_y).astype(jnp.uint32)

    # zeros-padding validity from the UNCLAMPED rounded coords
    # (`_warp_nearest_zeros` semantics).
    xu = jnp.round(_unnormalize_ac_false(grid[..., 0], W)).reshape(x0.shape)
    yu = jnp.round(_unnormalize_ac_false(grid[..., 1], H)).reshape(y0.shape)
    zu = jnp.round(_unnormalize_ac_false(grid[..., 2], D)).reshape(z0.shape)
    valid = (
        (xu >= 0) & (xu < W) & (yu >= 0) & (yu < H) & (zu >= 0) & (zu < D)
    ).astype(jnp.int32)

    img = 0.0
    lbl_code = 0
    for dz in (0, 1):
        lin = (jnp.minimum(z0 + dz, D - 1) * H + y0) * W + x0
        word = jnp.take_along_axis(pf, lin, axis=1)
        v00 = unpack_int6(word, 0)
        v10 = unpack_int6(word, 6)
        v01 = unpack_int6(word, 12)
        v11 = unpack_int6(word, 18)
        v = (1 - wy) * ((1 - wx) * v00 + wx * v10) + wy * ((1 - wx) * v01 + wx * v11)
        img = img + v * (wz if dz else 1 - wz)
        c = ((word >> lbl_shift) & 0x3).astype(jnp.int32)
        lbl_code = jnp.where(sel_z == dz, c, lbl_code)

    lbl_code = lbl_code * valid
    img = (img * scale).reshape((B,) + out_spatial)
    return img, (lbl_code & 1).reshape((B,) + out_spatial), (lbl_code >> 1).reshape((B,) + out_spatial)


def _warp_nearest_zeros(vol, grid):
    """Fast nearest warp, padding_mode='zeros', align_corners=False.
    vol: (B, D, H, W); grid: (B, D', H', W', 3)."""
    B, D, H, W = vol.shape
    out_spatial = grid.shape[1:-1]
    P = int(np.prod(out_spatial))

    x = jnp.round(_unnormalize_ac_false(grid[..., 0], W)).astype(jnp.int32).reshape(B, P)
    y = jnp.round(_unnormalize_ac_false(grid[..., 1], H)).astype(jnp.int32).reshape(B, P)
    z = jnp.round(_unnormalize_ac_false(grid[..., 2], D)).astype(jnp.int32).reshape(B, P)
    valid = (x >= 0) & (x < W) & (y >= 0) & (y < H) & (z >= 0) & (z < D)
    lin = (jnp.clip(z, 0, D - 1) * H + jnp.clip(y, 0, H - 1)) * W + jnp.clip(x, 0, W - 1)
    vals = jnp.take_along_axis(vol.reshape(B, -1), lin, axis=1)
    return (vals * valid.astype(vol.dtype)).reshape((B,) + out_spatial)


def warp_with_grid(b_image, b_label, grid, use_2d: bool = False):
    """Apply a warp grid: image bilinear/border, label nearest/zeros
    (`torch_utils.py:232-246`). Inputs are (B, *spatial) without channel dim."""
    sample = grid_sample_2d if use_2d else grid_sample_3d
    img_out = None
    lbl_out = None
    if b_image is not None:
        img_out = sample(
            b_image[:, None].astype(jnp.float32), grid, mode="bilinear", padding_mode="border",
            align_corners=False,
        )[:, 0]
    if b_label is not None:
        lbl_out = sample(
            b_label[:, None].astype(jnp.float32), grid, mode="nearest", padding_mode="zeros",
            align_corners=False,
        )[:, 0].astype(jnp.int32)
    return img_out, lbl_out


def spatial_augment(
    key,
    b_image=None,
    b_label=None,
    params: AugmentParams = AugmentParams(),
    pre_interpolation_factor: Optional[float] = None,
    use_2d: bool = False,
    b_grid_override=None,
):
    """Full `spatial_augment` (`torch_utils.py:99-251`): optional
    pre-interpolation, composed random grid (unless overridden), warp.

    Returns (image, label, grid) like the reference so the same grid can be
    re-applied to the modified label.
    """
    if pre_interpolation_factor:
        b_image, b_label = interpolate_sample(b_image, b_label, pre_interpolation_factor, use_2d)

    ref = b_image if b_image is not None else b_label
    batch = ref.shape[0]
    spatial = ref.shape[1:]

    if b_grid_override is None:
        grid = make_augment_grid(key, batch, spatial, params, use_2d=use_2d)
    else:
        grid = b_grid_override

    img_out, lbl_out = warp_with_grid(b_image, b_label, grid, use_2d=use_2d)
    return img_out, lbl_out, grid


def augment_sample_pair(
    key,
    b_image,
    b_label,
    b_modified_label,
    params: AugmentParams = AugmentParams(),
    pre_interpolation_factor: float = 2.0,
    use_2d: bool = False,
    order: str = "reference",
    mesh=None,
):
    """`HybridIdLoader.augment` + shared-grid modified-label warp
    (`HybridIdLoader.py:325-333,482-505`): noise on image, one spatial warp
    applied to image, clean label, and modified label.

    order:
      'reference' — interpolate x{factor} first, then warp at the upscaled
        resolution (reference-exact order, `HybridIdLoader.py:325-338`).
      'fast' — warp at BASE resolution (same continuous warp field: the grid
        is normalized, b-spline magnitudes use the post-interp dims), then
        matmul-resize to the target size. Gathers 3.4x fewer voxels; the
        augmentation *distribution* is equivalent, the per-sample voxels
        differ slightly (interpolation order). 3D only; identical to
        'reference' under an identity warp.
      'fast-bf16' — 'fast' plus the bf16-pair-packed image warp (4 gathers
        instead of 8; ~0.4% voxel rounding, an order of magnitude below the
        pipeline's own additive noise). Labels are unaffected (their packed
        nearest gather is exact in both orders).
      'reference-bf16' — reference ORDER (interpolate x{factor} first, warp
        at the upscaled resolution) with the bf16-pair-packed image warp:
        halves the dominant high-res gather cost while keeping the exact
        reference interpolation order; labels exact.
      'fast-int8' / 'reference-int8' — same orders with the int8 quad-packed
        image warp (2 gathers instead of 8: the whole 2x2 in-plane corner
        footprint rides one 32-bit word; ~1%-of-absmax quantization, several
        times below the pipeline's own additive noise). Labels exact.
      'fast-int6' / 'reference-int6' — ONE fully fused 2-gather warp for
        image AND both labels: int6 image quad + 2-bit label-code quad share
        each 32-bit word (`_warp_fused_int6pack`; binary labels only). The
        int6 quantization noise (uniform, var step²/12) is carved out of the
        configured additive-noise budget so the total per-voxel perturbation
        variance stays at `noise_strength²` — the augmentation's own noise
        pays for the quantization. Label warps stay exact.
      'fast-sep' — separable 3-pass scanline warp (`ops/sep_warp.py`):
        replaces the arbitrary-index gathers with Mosaic lane gathers
        (~17x the gather rate on TPU). Binary labels only; affine part
        inverted exactly, b-spline part by coarse-lattice fixed point —
        a near-identical but not bitwise-equal warp operator (image/label
        consistency exact by construction; deviation from the joint warp
        gated in tests/test_sep_warp.py and by the DP-recovery oracle).

    The two label warps share one nearest-neighbor gather (labels packed into
    one volume) — a quarter of the index traffic of two separate warps; the
    'int6' orders go further and ride them on the image gathers.
    """
    orders = (
        "reference", "reference-bf16", "reference-int8", "reference-int6",
        "fast", "fast-bf16", "fast-int8", "fast-int6", "fast-sep",
    )
    if order not in orders:
        raise ValueError(f"unknown augment order {order!r}")
    k_noise, k_spatial = jax.random.split(key)
    noise_strength = params.noise_strength
    if order.endswith("-int6") and not use_2d:
        # Noise-budget-aware quantization: subtract the int6 quantizer's
        # variance from the additive-noise budget, per sample (exact while
        # step²/12 <= strength²; clamps to zero extra noise beyond that).
        absmax = jnp.max(jnp.abs(b_image.reshape(b_image.shape[0], -1)), axis=1)
        var = params.noise_strength**2 - (absmax / 31.0) ** 2 / 12.0
        noise_strength = jnp.sqrt(jnp.maximum(var, 0.0)).reshape(
            (-1,) + (1,) * (b_image.ndim - 1)
        )
    b_image = augment_noise(k_noise, b_image, noise_strength)

    if order in ("fast", "fast-bf16", "fast-int8", "fast-int6", "fast-sep") and not use_2d:
        base_spatial = b_image.shape[1:]
        out_spatial = tuple(int(s * pre_interpolation_factor) for s in base_spatial)
        if order == "fast-sep":
            # Separable 3-pass warp (ops/sep_warp.py): Mosaic lane gathers
            # instead of arbitrary-index gathers (~17x the gather rate).
            # Binary labels only (2-bit packed codes, like the int6 order).
            # int12 image quantization (~0.07% absmax over the three passes)
            # sits ~45x below the int6 budget — no noise carve-out needed.
            from .sep_warp import assemble_grid_from_fields, sep_warp_apply, sep_warp_fields

            eff_theta, ctl = make_augment_parts(
                k_spatial, b_image.shape[0], base_spatial, params,
                strength_spatial=out_spatial,
            )
            fields = sep_warp_fields(eff_theta, ctl, base_spatial)
            img, lbl_w, mod_w = sep_warp_apply(
                b_image.astype(jnp.float32), b_label, b_modified_label, fields,
                mesh=mesh,
            )
            warped = (lbl_w + 2 * mod_w).astype(jnp.float32)
            divisor = 2
            grid = assemble_grid_from_fields(fields)
            img, _ = interpolate_sample(img, None, pre_interpolation_factor, False)
            _, warped_i = interpolate_sample(None, warped.astype(jnp.int32), pre_interpolation_factor, False)
            return img, warped_i % divisor, warped_i // divisor, grid
        grid = make_augment_grid(
            k_spatial, b_image.shape[0], base_spatial, params, use_2d=False,
            strength_spatial=out_spatial,
        )
        if order == "fast-int6":
            img, lbl_w, mod_w = _warp_fused_int6pack(
                b_image.astype(jnp.float32), b_label, b_modified_label, grid
            )
            warped = (lbl_w + 2 * mod_w).astype(jnp.float32)
            divisor = 2
        else:
            warp_img = {
                "fast": _warp_trilinear_border,
                "fast-bf16": _warp_trilinear_border_bf16pack,
                "fast-int8": _warp_trilinear_border_int8pack,
            }[order]
            img = warp_img(b_image.astype(jnp.float32), grid)
            packed = (b_label + 256 * b_modified_label).astype(jnp.float32)
            warped = _warp_nearest_zeros(packed, grid)
            divisor = 256
        img, _ = interpolate_sample(img, None, pre_interpolation_factor, False)
        _, warped_i = interpolate_sample(None, warped.astype(jnp.int32), pre_interpolation_factor, False)
        return img, warped_i % divisor, warped_i // divisor, grid

    b_image, _ = interpolate_sample(b_image, None, pre_interpolation_factor, use_2d)
    _, b_label = interpolate_sample(None, b_label, pre_interpolation_factor, use_2d)
    _, b_modified_label = interpolate_sample(None, b_modified_label, pre_interpolation_factor, use_2d)

    grid = make_augment_grid(k_spatial, b_image.shape[0], b_image.shape[1:], params, use_2d=use_2d)

    if use_2d:
        b_image = grid_sample_2d(
            b_image[:, None].astype(jnp.float32), grid, mode="bilinear", padding_mode="border",
            align_corners=False,
        )[:, 0]
        both = jnp.stack([b_label, b_modified_label], axis=1).astype(jnp.float32)
        warped = grid_sample_2d(both, grid, mode="nearest", padding_mode="zeros", align_corners=False)
        b_label = warped[:, 0].astype(jnp.int32)
        b_modified_label = warped[:, 1].astype(jnp.int32)
    elif order == "reference-int6":
        b_image, b_label, b_modified_label = _warp_fused_int6pack(
            b_image.astype(jnp.float32), b_label, b_modified_label, grid
        )
    else:
        warp_img = {
            "reference": _warp_trilinear_border,
            "reference-bf16": _warp_trilinear_border_bf16pack,
            "reference-int8": _warp_trilinear_border_int8pack,
        }[order]
        b_image = warp_img(b_image.astype(jnp.float32), grid)
        # One element-gather for BOTH labels: pack as label + 256*modified
        # (class ids < 256), warp nearest/zeros, unpack. Halves index traffic
        # vs a 2-channel gather and quarters it vs two separate warps.
        packed = (b_label + 256 * b_modified_label).astype(jnp.float32)
        warped = _warp_nearest_zeros(packed, grid).astype(jnp.int32)
        b_label = warped % 256
        b_modified_label = warped // 256
    return b_image, b_label, b_modified_label, grid
