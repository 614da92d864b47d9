"""A/B probe of trilinear-warp implementations at the strict-bench scale
(b8 x 192x192x75 = 22M output voxels) on the real chip.

Variants:
  cube    — ops/augment.py current: ONE lax.gather, slice_sizes (2,2,2)
            (8 corners per index; per-index cost amortized 8x).
  loop8   — 8 separate element gathers (round-1 implementation).
  nearest — packed-label nearest warp (1 element gather), for scale.

Timing: host-transfer sync (block_until_ready lies on the axon tunnel).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from deep_staple_tpu.ops.augment import (
    AugmentParams,
    _unnormalize_ac_false,
    _warp_nearest_zeros,
    make_augment_grid,
)

B, D, H, W = 8, 192, 192, 75


def warp_loop8(vol, grid):
    Bv, Dv, Hv, Wv = vol.shape
    out_spatial = grid.shape[1:-1]
    P = int(np.prod(out_spatial))
    x = jnp.clip(_unnormalize_ac_false(grid[..., 0], Wv), 0, Wv - 1).reshape(Bv, P)
    y = jnp.clip(_unnormalize_ac_false(grid[..., 1], Hv), 0, Hv - 1).reshape(Bv, P)
    z = jnp.clip(_unnormalize_ac_false(grid[..., 2], Dv), 0, Dv - 1).reshape(Bv, P)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    wx, wy, wz = x - x0, y - y0, z - z0
    vf = vol.reshape(Bv, Dv * Hv * Wv)
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                lin = (
                    jnp.minimum(z0 + dz, Dv - 1) * Hv + jnp.minimum(y0 + dy, Hv - 1)
                ) * Wv + jnp.minimum(x0 + dx, Wv - 1)
                v = jnp.take_along_axis(vf, lin, axis=1)
                out = out + v * (
                    (wx if dx else 1 - wx) * (wy if dy else 1 - wy) * (wz if dz else 1 - wz)
                )
    return out.reshape((Bv,) + out_spatial)


def timeit(fn, *args, iters=5, name=""):
    out = fn(*args)
    _ = float(np.asarray(out.reshape(-1)[0]))
    ts = []
    for _i in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = float(np.asarray(out.reshape(-1)[0]))
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    vox = B * D * H * W
    print(f"{name}: {dt*1000:.1f} ms  ({vox/dt/1e6:.0f} M out-voxel/s)")
    return dt


def warp_pair4(vol, grid):
    """Trilinear warp as 4 (1,2)-slice pair gathers (x-corners per index).

    MEASURED DEAD END: regardless of offset_dims order, XLA canonicalizes
    the gather output to f32[P,2]{1,0:T(8,128)} — the minor dim 2 pads 64x
    (10.55GB at bench scale, HBM OOM). Kept for the record; the 8-element-
    gather loop is the layout-safe optimum for exact warps on this chip."""
    Bv, Dv, Hv, Wv = vol.shape
    out_spatial = grid.shape[1:-1]
    P = int(np.prod(out_spatial))
    x = jnp.clip(_unnormalize_ac_false(grid[..., 0], Wv), 0, Wv - 1).reshape(Bv, P)
    y = jnp.clip(_unnormalize_ac_false(grid[..., 1], Hv), 0, Hv - 1).reshape(Bv, P)
    z = jnp.clip(_unnormalize_ac_false(grid[..., 2], Dv), 0, Dv - 1).reshape(Bv, P)
    x0 = jnp.minimum(jnp.floor(x).astype(jnp.int32), Wv - 2)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    wx, wy, wz = x - x0, y - y0, z - z0

    vf = vol.reshape(Bv, Dv * Hv * Wv)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(), start_index_map=(0,)
    )

    def pair(v1, starts):  # v1 (N,), starts (P,1) -> (2, P)
        return jax.lax.gather(
            v1, starts, dnums, slice_sizes=(2,), mode=jax.lax.GatherScatterMode.CLIP
        )

    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            lin = (
                jnp.minimum(z0 + dz, Dv - 1) * Hv + jnp.minimum(y0 + dy, Hv - 1)
            ) * Wv + x0
            pr = jax.vmap(pair)(vf, lin[..., None])  # (B, 2, P)
            v = pr[:, 0] * (1 - wx) + pr[:, 1] * wx
            out = out + v * ((wy if dy else 1 - wy) * (wz if dz else 1 - wz))
    return out.reshape((Bv,) + out_spatial)


def main():
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(B, D, H, W).astype(np.float32))
    lbl = jnp.asarray(rng.randint(0, 4, size=(B, D, H, W)).astype(np.float32))
    grid = make_augment_grid(jax.random.PRNGKey(0), B, (D, H, W), AugmentParams())
    grid = jax.block_until_ready(grid)

    f_loop = jax.jit(warp_loop8)
    f_pair = jax.jit(warp_pair4)
    f_near = jax.jit(_warp_nearest_zeros)

    a = np.asarray(f_pair(vol, grid))
    b = np.asarray(f_loop(vol, grid))
    print("pair4 == loop8:", np.allclose(a, b, rtol=1e-5, atol=1e-5))

    import jax.lax as lax
    def looped(f):
        @jax.jit
        def run(vol, grid):
            # state-threaded: warp output feeds next iteration's volume
            # (same shape: out spatial == vol spatial here)
            return lax.fori_loop(0, 5, lambda i, v: f(v, grid) * 0.999, vol)
        return run
    for name, f in (("loop8 (8 element gathers)", warp_loop8),
                    ("pair4 (4 pair gathers)", warp_pair4),
                    ("nearest (1 element gather)", None)):
        if f is None:
            timeit(jax.jit(_warp_nearest_zeros), lbl, grid, name=name)
            continue
        r = looped(f)
        o = r(vol, grid); _ = float(np.asarray(o.reshape(-1)[0]))
        import time as _t
        ts = []
        for _i in range(3):
            t0 = _t.time(); o = r(vol, grid); _ = float(np.asarray(o.reshape(-1)[0])); ts.append(_t.time() - t0)
        print(f"{name}: {np.median(ts)/5*1000:.1f} ms/warp (looped x5)")


if __name__ == "__main__":
    main()
