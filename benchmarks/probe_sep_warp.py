"""Separable (3-pass scanline) warp probe — can Mosaic's fast lane-gather
path replace the arbitrary-index warp gathers?

Background (benchmarks/probe_gather.py, round 2): XLA's flat element gather —
the production warp's engine — is scalar-issue bound at ~110-145M idx/s, and
Mosaic's tpu.dynamic_gather cannot express an arbitrary (row, lane) access.
But it CAN express a *lane-local* gather (take_along_axis axis=1 on a
(rows, 128) block) at ~610M elem/s resident in VMEM.

A spatial warp is not lane-local — but a *separable* decomposition of it is:
three scanline passes (Catmull-Smith multi-pass resampling), each resampling
along ONE axis only. Each pass's output row (b, i, j) reads ONLY input row
(b, i, j) — a perfectly tiled, row-local lane gather. The warp field is
affine + a heavily smoothed b-spline (`ops/augment.py`), so the shear
decomposition exists and is well-conditioned at the augmentation's operating
strengths (affine_strength 0.2, bspline 0.03).

This probe answers the THROUGHPUT question only (the decomposition math is a
separate, CPU-testable step):
  1. Does the streamed (HBM-gridded) Mosaic lane gather sustain the resident
     ~610M elem/s at warp scale (6.55M elems/pass, 51200x128 blocks)?
  2. Does a full in-kernel lerp pass (f32 coords -> floor/frac -> packed
     bf16-pair gather -> unpack -> lerp) compile and hold that rate?
  3. What do the narrow-minor passes cost (the W axis is 50 voxels at base
     res -> probe lanes=64 padded)?
  4. What do the two inter-pass transposes cost at volume scale?

Decision gate: sustained >= 350M elem/s on (1)+(2) makes the 3-pass warp
~3x cheaper than the production int6 warp's 2 arbitrary-index gathers
(2 x 6.55M @ ~130M/s ~= 100ms vs 3 x 6.55M @ >=350M/s + transposes ~= 60ms
worst case, ~40ms at 610M/s).

Run standalone on the chip (one TPU process at a time; cool the tunnel 3+ min
after any previous client). Timing: dispatch loops with one final host sync
(block_until_ready lies on the axon tunnel — CLAUDE.md).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0]))


def timeit(fn, *args, iters=20, name=""):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    s = sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt*1000:.2f} ms  (sync val {s:.3f})")
    return dt


# Pass scale: base-res batch volume 8 x (128,128,50) = 6.55M voxels.
N_ROWS = 51_200  # 6.55M / 128 lanes
LANES = 128
TILE = 2_048


def probe_streamed_lane_gather(n_rows=N_ROWS, lanes=LANES, tile=TILE, dtype=jnp.float32):
    """Q1/Q3: gridded take_along_axis(axis=1) streaming blocks from HBM."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n_rows, lanes).astype(np.float32)).astype(dtype)
    idx = jnp.asarray(rng.randint(0, lanes, size=(n_rows, lanes)).astype(np.int32))
    n_tiles = n_rows // tile

    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

    @jax.jit
    def f(x, idx):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            out_shape=jax.ShapeDtypeStruct((n_rows, lanes), dtype),
            in_specs=[
                pl.BlockSpec((tile, lanes), lambda i: (i, 0)),
                pl.BlockSpec((tile, lanes), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((tile, lanes), lambda i: (i, 0)),
        )(x, idx)

    name = f"streamed lane gather ({n_rows}x{lanes}) {np.dtype(dtype).name} tile={tile}"
    try:
        got = np.asarray(f(x, idx))
        want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
        ok = np.allclose(got, want)
        dt = timeit(lambda a, b: jnp.sum(f(a, b).astype(jnp.float32)), x, idx, name=name)
        print(f"  correct={ok}  -> {n_rows*lanes/dt/1e6:.0f} M elem/s")
        return dt
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None


def probe_lerp_pass(n_rows=N_ROWS, lanes=LANES, tile=TILE):
    """Q2: the real pass kernel — f32 coords, packed bf16 (tap, tap+1) pair
    words, in-kernel floor/frac/gather/unpack/lerp."""
    rng = np.random.RandomState(1)
    vol = rng.randn(n_rows, lanes).astype(np.float32)
    coords = (rng.rand(n_rows, lanes) * (lanes - 1)).astype(np.float32)

    v16 = jax.lax.bitcast_convert_type(jnp.asarray(vol).astype(jnp.bfloat16), jnp.uint16)
    nxt = jnp.concatenate([v16[:, 1:], v16[:, -1:]], axis=1)
    packed = (v16.astype(jnp.uint32) << 16) | nxt.astype(jnp.uint32)
    c = jnp.asarray(coords)
    n_tiles = n_rows // tile

    def kernel(p_ref, c_ref, o_ref):
        cc = c_ref[:]
        i0 = jnp.clip(jnp.floor(cc).astype(jnp.int32), 0, lanes - 2)
        w = cc - i0.astype(jnp.float32)
        word = jnp.take_along_axis(p_ref[:], i0, axis=1)
        v0 = jax.lax.bitcast_convert_type((word >> 16).astype(jnp.uint16), jnp.bfloat16)
        v1 = jax.lax.bitcast_convert_type((word & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
        o_ref[:] = v0.astype(jnp.float32) * (1.0 - w) + v1.astype(jnp.float32) * w

    @jax.jit
    def f(p, c):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            out_shape=jax.ShapeDtypeStruct((n_rows, lanes), jnp.float32),
            in_specs=[
                pl.BlockSpec((tile, lanes), lambda i: (i, 0)),
                pl.BlockSpec((tile, lanes), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((tile, lanes), lambda i: (i, 0)),
        )(p, c)

    name = f"lerp pass kernel ({n_rows}x{lanes})"
    try:
        got = np.asarray(f(packed, c))
        i0 = np.clip(np.floor(coords).astype(np.int64), 0, lanes - 2)
        w = coords - i0
        vb = np.asarray(jnp.asarray(vol).astype(jnp.bfloat16).astype(jnp.float32))
        v0 = np.take_along_axis(vb, i0, axis=1)
        v1 = np.take_along_axis(vb, np.minimum(i0 + 1, lanes - 1), axis=1)
        want = v0 * (1 - w) + v1 * w
        ok = np.allclose(got, want, atol=1e-2, rtol=1e-2)
        dt = timeit(lambda a, b: jnp.sum(f(a, b)), packed, c, name=name)
        print(f"  correct={ok}  -> {n_rows*lanes/dt/1e6:.0f} M elem/s")
        return dt
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None


def probe_transposes():
    """Q4: inter-pass axis rotations at volume scale, state-threaded chain."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 128, 128, 64).astype(np.float32))

    @jax.jit
    def roundtrip(x):
        # W-pass layout -> H-pass layout -> D-pass layout -> back
        a = jnp.transpose(x, (0, 1, 3, 2))  # (B, D, W, H): H minor
        b = jnp.transpose(a, (0, 3, 2, 1))  # (B, H, W, D): D minor
        return jnp.transpose(b, (0, 3, 1, 2)) + 1.0  # back to (B, D, H, W)

    # state-threaded: call k+1 consumes call k's output
    def chain(x, k=20):
        for _ in range(k):
            x = roundtrip(x)
        return x

    sync(chain(x, 2))
    t0 = time.time()
    s = sync(chain(x, 20))
    dt = (time.time() - t0) / 20
    print(f"transpose roundtrip (3 transposes, 8x128x128x64 f32): {dt*1000:.2f} ms  (sync {s:.3f})")
    return dt


def probe_xla_lane_gather(n_rows=N_ROWS, lanes=LANES):
    """Baseline: does plain XLA take_along_axis(axis=1) already hit the fast
    path without Pallas? (Expected: no — it lowers to the flat gather.)"""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(n_rows, lanes).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, lanes, size=(n_rows, lanes)).astype(np.int32))

    @jax.jit
    def f(x, idx):
        return jnp.sum(jnp.take_along_axis(x, idx, axis=1))

    dt = timeit(f, x, idx, name=f"XLA take_along_axis axis=1 ({n_rows}x{lanes})")
    print(f"  -> {n_rows*lanes/dt/1e6:.0f} M elem/s")
    return dt


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    print("devices:", jax.devices())
    probe_xla_lane_gather()
    probe_streamed_lane_gather()
    probe_streamed_lane_gather(dtype=jnp.bfloat16)
    # Narrow-minor case: the W axis is 50 voxels at base res; probe a 64-lane
    # padded layout (and 8x more rows is NOT the same total — keep totals
    # comparable: 6.55M elems).
    probe_streamed_lane_gather(n_rows=102_400, lanes=64, tile=4_096)
    probe_lerp_pass()
    probe_transposes()
