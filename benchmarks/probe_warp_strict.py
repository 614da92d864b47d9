"""Probe: where does the strict-order warp lose vs raw gather throughput?

BENCH_r02 attribution: warp gathers = 1862 ms/step for ~199M gather indices
(image 8x22.1M + packed labels 22.1M) => 107M idx/s achieved, while
probe_gather measured ~145M idx/s for a bare element gather. This probe
isolates the gap at the exact strict-bench shapes (b8 x 192x192x75 out of
192x192x75 volumes):

  base    — ops/augment.py `_warp_trilinear_border` as-is (index math fused
            into each gather by XLA).
  barrier — identical math but all 8 linearized index arrays + 8 weight
            arrays forced to materialize (optimization_barrier) before the
            gathers: is fused index arithmetic slowing the gather loop?
  concat  — ONE take_along_axis over (B, 8P) concatenated indices, then a
            weighted reshape-reduce: does per-op overhead matter at 8 ops?
  raw     — same total index count, random indices, no math: in-context
            upper bound.
  nearest — packed-label nearest warp (1 gather) for scale.

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
    _warp_trilinear_border,
    make_augment_grid,
)

B, D, H, W = 8, 192, 192, 75


def sync(x):
    return float(np.asarray(x.reshape(-1)[0]))


def timeit(fn, *args, iters=5, name=""):
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        times.append(time.time() - t0)
    dt = float(np.median(times))
    print(f"{name}: {dt*1000:.1f} ms", flush=True)
    return dt


def _corner_indices(vol, grid):
    Bv, Dv, Hv, Wv = vol.shape
    P = int(np.prod(grid.shape[1:-1]))
    x = jnp.clip(_unnormalize_ac_false(grid[..., 0], Wv), 0, Wv - 1).reshape(Bv, P)
    y = jnp.clip(_unnormalize_ac_false(grid[..., 1], Hv), 0, Hv - 1).reshape(Bv, P)
    z = jnp.clip(_unnormalize_ac_false(grid[..., 2], Dv), 0, Dv - 1).reshape(Bv, P)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    wx, wy, wz = x - x0, y - y0, z - z0
    lins, ws = [], []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                lin = (
                    jnp.minimum(z0 + dz, Dv - 1) * Hv + jnp.minimum(y0 + dy, Hv - 1)
                ) * Wv + jnp.minimum(x0 + dx, Wv - 1)
                w = (
                    (wx if dx else 1 - wx)
                    * (wy if dy else 1 - wy)
                    * (wz if dz else 1 - wz)
                )
                lins.append(lin)
                ws.append(w)
    return lins, ws


def warp_barrier(vol, grid):
    Bv = vol.shape[0]
    lins, ws = _corner_indices(vol, grid)
    lins = list(jax.lax.optimization_barrier(tuple(lins)))
    ws = list(jax.lax.optimization_barrier(tuple(ws)))
    vf = vol.reshape(Bv, -1)
    out = 0.0
    for lin, w in zip(lins, ws):
        out = out + jnp.take_along_axis(vf, lin, axis=1) * w
    return out.reshape(vol.shape)


def warp_concat(vol, grid):
    Bv = vol.shape[0]
    lins, ws = _corner_indices(vol, grid)
    P = lins[0].shape[1]
    lin8 = jnp.concatenate(lins, axis=1)  # (B, 8P)
    vals = jnp.take_along_axis(vol.reshape(Bv, -1), lin8, axis=1).reshape(Bv, 8, P)
    w8 = jnp.stack(ws, axis=1)  # (B, 8, P)
    return jnp.sum(vals * w8, axis=1).reshape(vol.shape)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(B, D, H, W).astype(np.float32))
    key = jax.random.PRNGKey(0)
    grid = jax.jit(
        lambda k: make_augment_grid(k, B, (D, H, W), AugmentParams())
    )(key)
    sync(grid)

    P = D * H * W
    idx = jnp.asarray(rng.randint(0, P, size=(B, 8 * P)).astype(np.int32))

    @jax.jit
    def raw(vol, idx):
        return jnp.sum(
            jnp.take_along_axis(vol.reshape(B, -1), idx, axis=1).reshape(B, 8, P),
            axis=1,
        )

    t_raw = timeit(raw, vol, idx, name=f"raw gather 8x{P*B/1e6:.1f}M idx")
    print(f"  -> {8*P*B/t_raw/1e6:.0f}M idx/s", flush=True)

    for name, fn in (
        ("base (8 gathers, fused idx math)", _warp_trilinear_border),
        ("barrier (idx precomputed)", warp_barrier),
        ("concat (1 gather of 8P)", warp_concat),
    ):
        t = timeit(jax.jit(fn), vol, grid, name=name)
        print(f"  -> {8*P*B/t/1e6:.0f}M idx/s", flush=True)

    t_n = timeit(jax.jit(_warp_nearest_zeros), vol, grid, name="nearest packed (1 gather)")
    print(f"  -> {P*B/t_n/1e6:.0f}M idx/s", flush=True)


if __name__ == "__main__":
    main()
