"""First-party `grid_sample` / `affine_grid` with PyTorch semantics on TPU.

The reference's augmentation engine composes a random b-spline displacement
field with a random affine into a single warp grid and resamples image/label
through `F.affine_grid` + `F.grid_sample`
(`deep_staple/utils/torch_utils.py:99-251`). There is no such primitive in
XLA, so it is built here from flattened gathers, which XLA tiles well on TPU.

Conventions (identical to torch):
  * grid last-dim components are (x, y[, z]) addressing (W, H[, D]),
    normalized to [-1, 1].
  * align_corners=False unnormalizes as ((c + 1) * size - 1) / 2.
  * padding_mode 'zeros' masks out-of-bounds contributions;
    'border' clamps coordinates.
  * mode 'nearest' rounds half-to-even (torch uses std::nearbyint).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_3d(inp_flat, b_idx_shape, iz, iy, ix, D, H, W, valid=None):
    """Gather inp_flat (B, C, D*H*W) at integer voxel coords (B, *spatial)."""
    lin = (iz * H + iy) * W + ix
    B, C = inp_flat.shape[0], inp_flat.shape[1]
    lin2 = lin.reshape(B, 1, -1)
    out = jnp.take_along_axis(inp_flat, jnp.broadcast_to(lin2, (B, C, lin2.shape[-1])), axis=2)
    out = out.reshape((B, C) + b_idx_shape)
    if valid is not None:
        out = out * valid[:, None].astype(out.dtype)
    return out


def grid_sample_3d(inp, grid, mode: str = "bilinear", padding_mode: str = "zeros", align_corners: bool = False):
    """Sample (B, C, D, H, W) volume at grid (B, Do, Ho, Wo, 3) of (x, y, z)."""
    B, C, D, H, W = inp.shape
    out_spatial = grid.shape[1:-1]
    inp_flat = inp.reshape(B, C, D * H * W)

    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)
    z = _unnormalize(grid[..., 2], D, align_corners)

    if padding_mode == "border":
        x = jnp.clip(x, 0, W - 1)
        y = jnp.clip(y, 0, H - 1)
        z = jnp.clip(z, 0, D - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"Unsupported padding_mode '{padding_mode}'")

    if mode == "nearest":
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        iz = jnp.round(z).astype(jnp.int32)
        valid = None
        if padding_mode == "zeros":
            valid = (
                (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H) & (iz >= 0) & (iz < D)
            )
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
        iz = jnp.clip(iz, 0, D - 1)
        return _gather_3d(inp_flat, out_spatial, iz, iy, ix, D, H, W, valid)

    if mode != "bilinear":
        raise ValueError(f"Unsupported mode '{mode}'")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    wx = (x - x0).astype(inp.dtype)
    wy = (y - y0).astype(inp.dtype)
    wz = (z - z0).astype(inp.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ix = x0i + dx
                iy = y0i + dy
                iz = z0i + dz
                w = (
                    (wx if dx else (1 - wx))
                    * (wy if dy else (1 - wy))
                    * (wz if dz else (1 - wz))
                )
                valid = None
                if padding_mode == "zeros":
                    valid = (
                        (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H) & (iz >= 0) & (iz < D)
                    )
                ixc = jnp.clip(ix, 0, W - 1)
                iyc = jnp.clip(iy, 0, H - 1)
                izc = jnp.clip(iz, 0, D - 1)
                corner = _gather_3d(inp_flat, out_spatial, izc, iyc, ixc, D, H, W, valid)
                out = out + corner * w[:, None]
    return out


def grid_sample_2d(inp, grid, mode: str = "bilinear", padding_mode: str = "zeros", align_corners: bool = False):
    """Sample (B, C, H, W) image at grid (B, Ho, Wo, 2) of (x, y)."""
    B, C, H, W = inp.shape
    # Reuse the 3D path with a singleton depth axis; z coordinate pinned to the
    # center so align_corners handling stays exact (z = 0 normalized maps to the
    # single slice under both conventions when D == 1... only for ac=False).
    inp3 = inp[:, :, None]
    zeros = jnp.zeros_like(grid[..., :1])
    grid3 = jnp.concatenate([grid, zeros], axis=-1)[:, None]
    if align_corners:
        # For D == 1, align_corners=True unnormalize gives z = (0+1)/2*0 = 0: fine.
        pass
    out = grid_sample_3d(inp3, grid3, mode=mode, padding_mode=padding_mode, align_corners=align_corners)
    return out[:, :, 0]


def _base_coords(size: int, align_corners: bool):
    i = jnp.arange(size, dtype=jnp.float32)
    if align_corners:
        if size == 1:
            return jnp.zeros((1,), jnp.float32)
        return -1.0 + 2.0 * i / (size - 1)
    return (2.0 * i + 1.0) / size - 1.0


def affine_grid_3d(theta, spatial, align_corners: bool = False):
    """torch.nn.functional.affine_grid for 5D: theta (B, 3, 4) -> (B, D, H, W, 3).

    Grid components are (x, y, z) with x varying along W.
    """
    D, H, W = spatial
    xs = _base_coords(W, align_corners)
    ys = _base_coords(H, align_corners)
    zs = _base_coords(D, align_corners)
    gz, gy, gx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    # Elementwise broadcast instead of a matmul: a 4-wide contraction would be
    # lowered to the MXU at bf16 default precision on TPU; this stays exact f32
    # on the VPU. out[b, d, h, w, c] = sum_k base[d, h, w, k] * theta[b, c, k].
    t = theta[:, None, None, None, :, :]  # (B, 1, 1, 1, 3, 4)
    return (
        gx[None, ..., None] * t[..., 0]
        + gy[None, ..., None] * t[..., 1]
        + gz[None, ..., None] * t[..., 2]
        + t[..., 3]
    )


def affine_grid_2d(theta, spatial, align_corners: bool = False):
    """torch.nn.functional.affine_grid for 4D: theta (B, 2, 3) -> (B, H, W, 2)."""
    H, W = spatial
    xs = _base_coords(W, align_corners)
    ys = _base_coords(H, align_corners)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    t = theta[:, None, None, :, :]  # (B, 1, 1, 2, 3)
    return gx[None, ..., None] * t[..., 0] + gy[None, ..., None] * t[..., 1] + t[..., 2]
