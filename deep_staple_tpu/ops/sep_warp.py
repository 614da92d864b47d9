"""Separable (3-pass scanline) warp — the TPU-fast augmentation engine.

The joint spatial warp (`ops/augment.py`) is an arbitrary-index gather,
which the TPU executes on the scalar unit at ~122M idx/s (probed:
`benchmarks/probe_gather.py`); no Mosaic kernel can express an arbitrary
(row, lane) access. But a *separable* decomposition of the warp — three
scanline passes, each resampling along ONE axis (Catmull & Smith 1980
multi-pass resampling) — is row-local: pass output row (b, i, j) reads only
input row (b, i, j), a lane-local gather that Mosaic runs at ~2.3G elem/s
(`benchmarks/probe_sep_warp.py`, 17x the flat gather). At the production
warp scale this turns the ~110ms warp bucket into ~15-20ms.

Decomposition. The augmentation map samples input position
    X(p), Y(p), Z(p) = A·u(p) + t + s(p)
per output voxel p (normalized coords; A,t = the effective affine
`eff_theta`, s = the smoothed b-spline displacement field — see
`ops/augment.py::make_augment_grid`, reference `torch_utils.py:99-251`).
Three passes applied x-then-y-then-z:

    t1[z,y,x]  = in[z, y, fx(z,y,x)]
    t2[z,y,x]  = t1[z, fy(z,y,x), x]
    out[z,y,x] = t2[fz(z,y,x), y, x]

compose to in[z', y', x'] with z' = fz(z,y,x), y' = fy(z',y,x),
x' = fx(z',y',x). Matching (X,Y,Z) requires
    fz = Z                                   (exact, on the output lattice)
    fy(ζ,y,x) = Y(z*,y,x),  z* solving Z(z*,y,x)=ζ
    fx(ζ,υ,x) = X(z*,y*,x), (z*,y*) solving Z=ζ, Y=υ
i.e. partial *inversions* of the warp. The affine part inverts exactly
(per-sample 1x1 / 2x2 linear solves); the b-spline part by fixed-point
iteration with the field evaluated through interpolation. Because the field
is heavily smoothed (6³ control points), the inversion is solved on a COARSE
lattice (~1/8 resolution) and the resulting fy/fx fields upsampled
trilinearly — exact for the affine terms (linear functions reproduce under
trilinear interpolation), second-order accurate for the b-spline terms.

Where the warp *folds* (1 + ∂s/∂axis < 0 — measured ~0.5% of voxels at the
reference's operating strengths, since b-spline voxel displacements reach
tens of voxels), no single-valued inverse exists and the fixed point settles
on one branch: the separable warp is a slightly different (still smooth,
still label-consistent) augmentation operator in those pockets. Image and
labels ride the SAME passes, so (image, label) geometric consistency — the
property the data-parameter mechanism needs — is exact by construction; the
deviation is gated empirically in `tests/test_sep_warp.py` and the
DP-recovery oracle.

Value interpolation: each pass is a 1D lerp (image, border padding) or 1D
nearest (labels, zeros padding). For pure translations this composes to
exactly the joint trilinear/nearest warp; for general warps the value
interpolation differs at second order (lerp across sheared axes).

Packing (the TPU fast path): per pass, each input voxel packs the lane pair
(i, i+1) of the image as two int12 quanta plus the pair's 2-bit label codes
(label | modified<<1) into ONE 32-bit word — a single lane gather per output
element fetches everything. Image quantization: absmax/2047 on the first
pass, +/-0.5 quantum on the two integer-unit repacks — ~0.07% of absmax
total, ~45x below the accepted int6-warp quantization and far below the
pipeline's own additive noise, so no noise-budget carve-out is needed
(compare `augment.py::_warp_fused_int6pack`).

Reference behavior being accelerated: `torch_utils.py:99-251`
(spatial_augment) as used by `HybridIdLoader.py:325-333,482-505`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .augment import _unnormalize_ac_false as _unnorm
from .resample import resize_nd

_AFFINE_GUARD = 0.05  # |denominator| floor for the per-sample linear solves


class SepWarpFields(NamedTuple):
    """Per-pass coordinate fields, NORMALIZED ([-1,1], torch grid convention),
    each (B, D, H, W) indexed by the pass's output lattice (z, y, x)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    fz: jnp.ndarray


def _norm_coords_at(vox, size):
    """Normalized coord of a (possibly fractional) voxel position — the
    inverse of `augment._unnormalize_ac_false` (imported above as `_unnorm`,
    the ONE copy of the align_corners=False convention both warps share:
    u = (2v+1)/size - 1)."""
    return (2.0 * vox + 1.0) / size - 1.0


def _guard(x):
    s = jnp.where(x < 0, -1.0, 1.0)
    return jnp.where(jnp.abs(x) < _AFFINE_GUARD, s * _AFFINE_GUARD, x)


def _interp_axis1(f, t):
    """Lerp f (B, N, ...) along axis 1 at continuous indices t (B, M, ...);
    trailing axes of t match f's (on-lattice conditioning)."""
    n = f.shape[1]
    t = jnp.clip(t, 0.0, n - 1.0)
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, max(n - 2, 0))
    w = t - i0
    v0 = jnp.take_along_axis(f, i0, axis=1)
    v1 = jnp.take_along_axis(f, jnp.minimum(i0 + 1, n - 1), axis=1)
    return v0 * (1 - w) + v1 * w


def _interp_zy(f, tz, ty):
    """Bilerp f (B, Dc, Hc, Wc) over its (z, y) axes at continuous indices
    tz, ty (B, M1, M2, Wc); the x axis stays on-lattice."""
    B, Dc, Hc, Wc = f.shape
    tz = jnp.clip(tz, 0.0, Dc - 1.0)
    ty = jnp.clip(ty, 0.0, Hc - 1.0)
    iz = jnp.clip(jnp.floor(tz).astype(jnp.int32), 0, max(Dc - 2, 0))
    iy = jnp.clip(jnp.floor(ty).astype(jnp.int32), 0, max(Hc - 2, 0))
    wz = tz - iz
    wy = ty - iy
    ff = f.reshape(B, Dc * Hc, Wc)
    out_shape = tz.shape

    def tap(dz, dy):
        lin = (jnp.minimum(iz + dz, Dc - 1) * Hc + jnp.minimum(iy + dy, Hc - 1))
        g = jnp.take_along_axis(ff, lin.reshape(B, -1, Wc), axis=1)
        return g.reshape(out_shape)

    return (
        tap(0, 0) * (1 - wz) * (1 - wy)
        + tap(0, 1) * (1 - wz) * wy
        + tap(1, 0) * wz * (1 - wy)
        + tap(1, 1) * wz * wy
    )


def sep_warp_fields(
    eff_theta,
    ctl,
    spatial: Sequence[int],
    coarse: Optional[Sequence[int]] = None,
    iters: int = 4,
) -> SepWarpFields:
    """Build the three pass fields from the warp's parts.

    Args:
        eff_theta: (B, 3, 4) effective affine (coin already folded in, as in
            `make_augment_grid`).
        ctl: (B, 3, n, n, n) smoothed+scaled b-spline control field with the
            b-spline coin already folded in (zeroed rows where the coin is
            off); channel c displaces grid component c (x, y, z) — including
            the reference's (D, H, W)[c] scaling quirk.
        spatial: (D, H, W) of the warp lattice.
        coarse: coarse solve lattice (defaults to ~1/8 resolution, min 5).
        iters: fixed-point iterations for the b-spline inversions.
    """
    D, H, W = (int(s) for s in spatial)
    B = eff_theta.shape[0]
    if coarse is None:
        coarse = tuple(max(5, s // 8 + 1) for s in (D, H, W))
    Dc, Hc, Wc = (int(c) for c in coarse)

    th = eff_theta.reshape(B, 3, 4, *([1] * 3)).astype(jnp.float32)

    def m(i, j):
        return th[:, i, j]

    # Solver field: the SAME continuous b-spline interpolant sampled on the
    # coarse lattice (linear resize of ctl samples the piecewise-trilinear
    # interpolant of ctl at any resolution).
    sc = jnp.transpose(
        resize_nd(ctl.astype(jnp.float32), (Dc, Hc, Wc), mode="linear", align_corners=True),
        (0, 2, 3, 4, 1),
    )  # (B, Dc, Hc, Wc, 3)

    # Coarse lattice voxel positions (align_corners=True span of the full
    # lattice: linspace over [0, size-1]) and their normalized coords.
    zv = jnp.linspace(0.0, D - 1.0, Dc)
    yv = jnp.linspace(0.0, H - 1.0, Hc)
    xv = jnp.linspace(0.0, W - 1.0, Wc)
    ucz = _norm_coords_at(zv, D).reshape(1, Dc, 1, 1)
    ucy = _norm_coords_at(yv, H).reshape(1, 1, Hc, 1)
    ucx = _norm_coords_at(xv, W).reshape(1, 1, 1, Wc)

    def vox2cidx(vox, size, csize):
        return vox * ((csize - 1.0) / max(size - 1.0, 1.0))

    # --- z-inversion for fy: solve Z(z*, y, x) = zeta on the coarse lattice.
    t22 = _guard(m(2, 2))
    rhs_z = ucz - m(2, 0) * ucx - m(2, 1) * ucy - m(2, 3)
    w = rhs_z / t22  # affine-only init (exact when the b-spline coin is off)
    zi = None
    for _ in range(iters):
        zi = vox2cidx(_unnorm(w, D), D, Dc)
        szv = _interp_axis1(sc[..., 2], zi)
        w = (rhs_z - szv) / t22
    zi = vox2cidx(_unnorm(w, D), D, Dc)
    syv = _interp_axis1(sc[..., 1], zi)
    fy_c = m(1, 0) * ucx + m(1, 1) * ucy + m(1, 2) * w + m(1, 3) + syv

    # --- (z, y)-inversion for fx: solve Z = zeta, Y = upsilon jointly.
    det = _guard(m(2, 2) * m(1, 1) - m(2, 1) * m(1, 2))
    r1a = ucz - m(2, 0) * ucx - m(2, 3)
    r2a = ucy - m(1, 0) * ucx - m(1, 3)
    w2 = (m(1, 1) * r1a - m(2, 1) * r2a) / det
    v2 = (-m(1, 2) * r1a + m(2, 2) * r2a) / det
    zi2 = yi2 = None
    for _ in range(iters):
        zi2 = vox2cidx(_unnorm(w2, D), D, Dc)
        yi2 = vox2cidx(_unnorm(v2, H), H, Hc)
        szv = _interp_zy(sc[..., 2], zi2, yi2)
        syv = _interp_zy(sc[..., 1], zi2, yi2)
        r1 = r1a - szv
        r2 = r2a - syv
        w2 = (m(1, 1) * r1 - m(2, 1) * r2) / det
        v2 = (-m(1, 2) * r1 + m(2, 2) * r2) / det
    zi2 = vox2cidx(_unnorm(w2, D), D, Dc)
    yi2 = vox2cidx(_unnorm(v2, H), H, Hc)
    sxv = _interp_zy(sc[..., 0], zi2, yi2)
    fx_c = m(0, 0) * ucx + m(0, 1) * v2 + m(0, 2) * w2 + m(0, 3) + sxv

    # Upsample the solved coarse fields (trilinear reproduces the affine
    # terms exactly; the b-spline terms are smooth).
    up = resize_nd(
        jnp.stack([fx_c, fy_c], axis=1), (D, H, W), mode="linear", align_corners=True
    )
    fx_full, fy_full = up[:, 0], up[:, 1]

    # fz is exact: the joint map's z component on the full lattice.
    uz = _norm_coords_at(jnp.arange(D, dtype=jnp.float32), D).reshape(1, D, 1, 1)
    uy = _norm_coords_at(jnp.arange(H, dtype=jnp.float32), H).reshape(1, 1, H, 1)
    ux = _norm_coords_at(jnp.arange(W, dtype=jnp.float32), W).reshape(1, 1, 1, W)
    sz_full = jnp.transpose(
        resize_nd(ctl[:, 2:3].astype(jnp.float32), (D, H, W), mode="linear", align_corners=True),
        (0, 2, 3, 4, 1),
    )[..., 0]
    fz_full = m(2, 0) * ux + m(2, 1) * uy + m(2, 2) * uz + m(2, 3) + sz_full

    return SepWarpFields(fx=fx_full, fy=fy_full, fz=fz_full)


def assemble_grid_from_fields(fields: SepWarpFields):
    """(B, D, H, W, 3) stack of the PER-PASS coordinate fields (x, y, z).

    NOTE: this is the cheap API-compatibility return for
    `augment_sample_pair`'s grid slot, NOT the joint-equivalent grid — fy/fx
    are indexed on their pass's intermediate lattice. For analysis or gating
    against the joint warp use `compose_joint_grid` (which interpolates the
    fields at the composed coordinates; element gathers — not hot-path)."""
    return jnp.stack([fields.fx, fields.fy, fields.fz], axis=-1)


def compose_joint_grid(fields: SepWarpFields):
    """The joint-warp-equivalent grid the three passes realize (first-order
    in the value-interpolation sense): z' = fz, y' = fy(z',·,·),
    x' = fx(z', y', ·). (B, D, H, W, 3) normalized, like
    `make_augment_grid`'s output. Analysis/gating only (element gathers)."""
    B, D, H, W = fields.fz.shape
    zp = fields.fz
    zv = jnp.clip(_unnorm(zp, D), 0.0, D - 1.0)
    yp = _interp_axis1(fields.fy, zv)
    yv = jnp.clip(_unnorm(yp, H), 0.0, H - 1.0)
    xp = _interp_zy(fields.fx, zv, yv)
    return jnp.stack([xp, yp, zp], axis=-1)


# ---------------------------------------------------------------------------
# Pass application (packed int12-pair image + 2-bit label codes per word).


def _pack_pass(img, code, scale):
    """Pack each lane's (i, i+1) pair: image as 2x int12 (bits 0..23, border-
    replicated at the last lane) + label codes (2 bits each, bits 24..27)."""
    q = jnp.clip(jnp.round(img / scale), -2047, 2047).astype(jnp.int32) & 0xFFF
    qn = jnp.concatenate([q[..., 1:], q[..., -1:]], axis=-1)
    cn = jnp.concatenate([code[..., 1:], code[..., -1:]], axis=-1)
    return (q | (qn << 12) | (code << 24) | (cn << 26)).astype(jnp.uint32)


def _pass_elem_math(g, cc, L: int):
    """Shared per-element math of one pass, given the gathered words g and
    the raw (unclamped) voxel coords cc. Used verbatim by BOTH the XLA path
    and the Pallas kernel body so the two are numerically identical."""
    cimg = jnp.clip(cc, 0.0, L - 1.0)
    i0 = jnp.clip(jnp.floor(cimg).astype(jnp.int32), 0, max(L - 2, 0))
    w = cimg - i0.astype(jnp.float32)
    gi = g.astype(jnp.int32)
    v0 = (((gi & 0xFFF) ^ 0x800) - 0x800).astype(jnp.float32)
    v1 = ((((gi >> 12) & 0xFFF) ^ 0x800) - 0x800).astype(jnp.float32)
    img = v0 * (1.0 - w) + v1 * w
    # Labels: nearest (round like `_warp_nearest_zeros`), zeros outside.
    r = jnp.round(cc).astype(jnp.int32)
    sel = jnp.clip(r - i0, 0, 1)
    c0 = (gi >> 24) & 0x3
    c1 = (gi >> 26) & 0x3
    code = jnp.where(sel == 1, c1, c0)
    valid = (cc >= -0.5) & (cc < L - 0.5)
    return img, jnp.where(valid, code, 0)


def _pass_index_math(cc, L: int):
    """The gather index of `_pass_elem_math` (factored so both impls agree)."""
    cimg = jnp.clip(cc, 0.0, L - 1.0)
    return jnp.clip(jnp.floor(cimg).astype(jnp.int32), 0, max(L - 2, 0))


def _row_tile(n: int, cap: int = 2048) -> int:
    t = cap
    while t > 1 and n % t:
        t //= 2
    return max(t, 1)


def _sep_pass_xla(word, cc, L: int):
    i0 = _pass_index_math(cc, L)
    g = jnp.take_along_axis(word, i0, axis=-1)
    return _pass_elem_math(g, cc, L)


def _sep_pass_pallas(word, cc, L: int):
    """One separable pass as a Mosaic lane-gather kernel
    (~2.3G elem/s streamed — benchmarks/probe_sep_warp.py)."""
    from jax.experimental import pallas as pl

    shape = word.shape
    w2 = word.reshape(-1, L)
    c2 = cc.reshape(-1, L)
    # Pad lanes to a multiple of 64 (Mosaic-friendly; probed at 64 and 128).
    Lp = -(-L // 64) * 64
    if Lp != L:
        w2 = jnp.pad(w2, ((0, 0), (0, Lp - L)))
        c2 = jnp.pad(c2, ((0, 0), (0, Lp - L)), constant_values=-1.0)
    n = w2.shape[0]
    tile = _row_tile(n)

    def kernel(w_ref, c_ref, oi_ref, oc_ref):
        ccb = c_ref[:]
        i0 = _pass_index_math(ccb, L)
        g = jnp.take_along_axis(w_ref[:], i0, axis=1)
        img, code = _pass_elem_math(g, ccb, L)
        oi_ref[:] = img
        oc_ref[:] = code

    img, code = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        out_shape=(
            jax.ShapeDtypeStruct((n, Lp), jnp.float32),
            jax.ShapeDtypeStruct((n, Lp), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((tile, Lp), lambda i: (i, 0)),
            pl.BlockSpec((tile, Lp), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((tile, Lp), lambda i: (i, 0)),
            pl.BlockSpec((tile, Lp), lambda i: (i, 0)),
        ),
    )(w2, c2)
    if Lp != L:
        img, code = img[:, :L], code[:, :L]
    return img.reshape(shape), code.reshape(shape)


def resolve_sep_impl(impl: str = "auto") -> str:
    """'pallas' on TPU, 'xla' elsewhere (the Mosaic lane gather only exists
    on TPU; XLA's take_along_axis is the numerics-identical fallback and the
    CPU test path). Resolution keys off jax.default_backend() at trace time,
    like models/lraspp3d.py::resolve_depthwise_impl."""
    if impl != "auto":
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def sep_warp_apply(
    img,
    lbl,
    mod,
    fields: SepWarpFields,
    impl: str = "auto",
    mesh=None,
    data_axis: str = "data",
):
    """Apply the separable warp: image 1D-lerp/border, labels 1D-nearest/zeros
    per pass, all three arrays riding one packed word stream per pass.

    img: (B, D, H, W) f32; lbl/mod: (B, D, H, W) binary int. Returns
    (img, lbl, mod) at the same shape.

    mesh: optional jax.sharding.Mesh. A `pallas_call` carries no GSPMD
    partitioning rule, so under a multi-device mesh XLA would replicate its
    operands (all-gathering the sharded batch onto every device). The warp is
    per-sample, so with a mesh we instead `shard_map` the whole 3-pass
    application over the batch (`data_axis`): each device runs the passes on
    its local batch shard, no collectives. Requires the batch divisible by
    the axis size and UNSHARDED spatial axes (the passes gather along every
    spatial axis — the driver keeps the fast-int6 downgrade for
    spatially-sharded meshes).
    """
    B, D, H, W = img.shape
    if mesh is not None and data_axis in mesh.shape:
        from jax.sharding import PartitionSpec

        if B % mesh.shape[data_axis]:
            raise ValueError(
                f"sep warp shard_map: batch {B} not divisible by mesh axis "
                f"{data_axis!r} ({mesh.shape[data_axis]})"
            )
        spec = PartitionSpec(data_axis)

        def local(i, l, m, f):
            return sep_warp_apply(i, l, m, f, impl=impl, mesh=None)

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(spec, spec, spec, SepWarpFields(spec, spec, spec)),
            out_specs=(spec, spec, spec),
            check_vma=False,
        )(img, lbl, mod, fields)
    impl = resolve_sep_impl(impl)
    one_pass = _sep_pass_pallas if impl == "pallas" else _sep_pass_xla

    scale = jnp.max(jnp.abs(img.reshape(B, -1)), axis=1).reshape(B, 1, 1, 1) / 2047.0
    scale = jnp.maximum(scale, 1e-12)
    code = (lbl + 2 * mod).astype(jnp.int32)
    one = jnp.ones_like(scale)

    # Pass 1 along W (layout (B, D, H, W)); image leaves in int12 units so the
    # two repacks quantize at +/-0.5 unit instead of re-running absmax.
    word = _pack_pass(img.astype(jnp.float32), code, scale)
    x1, c1 = one_pass(word, _unnorm(fields.fx, W), W)

    # Pass 2 along H (transpose to (B, D, W, H)).
    x1 = jnp.transpose(x1, (0, 1, 3, 2))
    c1 = jnp.transpose(c1, (0, 1, 3, 2))
    ccy = jnp.transpose(_unnorm(fields.fy, H), (0, 1, 3, 2))
    word = _pack_pass(x1, c1, one)
    x2, c2 = one_pass(word, ccy, H)

    # Pass 3 along D (transpose to (B, H, W, D)).
    x2 = jnp.transpose(x2, (0, 3, 2, 1))
    c2 = jnp.transpose(c2, (0, 3, 2, 1))
    ccz = jnp.transpose(_unnorm(fields.fz, D), (0, 2, 3, 1))
    word = _pack_pass(x2, c2, one)
    x3, c3 = one_pass(word, ccz, D)

    img_out = jnp.transpose(x3, (0, 3, 1, 2)) * scale
    code_out = jnp.transpose(c3, (0, 3, 1, 2))
    return img_out, code_out & 1, code_out >> 1
