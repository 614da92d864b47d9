"""TPU gather micro-probes for the augmentation warp (run standalone on the
chip; one TPU process at a time).

Questions answered:
  1. XLA take_along_axis element-gather throughput (the current warp cost).
  2. Whether Mosaic's tpu.dynamic_gather (jnp.take_along_axis inside a Pallas
     kernel, axis 0/1 on a 2D block) compiles on this chip, for which operand
     sizes, and at what throughput.
  3. bf16 packed-pair gather (two taps per 32-bit gather word).

Timing: state-threaded loops + host transfer sync (block_until_ready lies on
the axon tunnel — CLAUDE.md).
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0]))


def timeit(fn, *args, iters=5, name=""):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    s = sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt*1000:.2f} ms  (sync val {s:.3f})")
    return dt


def probe_xla_gather(P=22_000_000, V=2_700_000):
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(V).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, V, size=(P,)).astype(np.int32))

    @jax.jit
    def f(vol, idx):
        return jnp.sum(vol[idx])

    dt = timeit(f, vol, idx, name=f"XLA 1D element gather P={P/1e6:.0f}M")
    print(f"  -> {P/dt/1e6:.0f} M elem/s")


def probe_pallas_dynamic_gather(rows=1024, axis=0, dtype=jnp.float32, iters=20):
    N, L = rows, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, L).astype(dtype))
    if axis == 0:
        idx = jnp.asarray(rng.randint(0, N, size=(N, L)).astype(np.int32))
    else:
        idx = jnp.asarray(rng.randint(0, L, size=(N, L)).astype(np.int32))

    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=axis)

    @jax.jit
    def f(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, L), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    try:
        want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=axis)
        got = np.asarray(f(x, idx))
        ok = np.allclose(got, want)
        dt = timeit(lambda a, b: jnp.sum(f(a, b)), x, idx, iters=iters,
                    name=f"pallas dynamic_gather axis={axis} rows={N} {np.dtype(dtype).name}")
        print(f"  correct={ok}  -> {N*L/dt/1e6:.0f} M elem/s")
    except Exception as e:
        print(f"pallas dynamic_gather axis={axis} rows={N}: FAILED {type(e).__name__}: {str(e)[:300]}")


def probe_grid_gather(n_tiles=170, rows=8192, axis=0):
    """Grid version: one big x resident, per-step idx/out tiles of x's shape."""
    N, L = rows, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, L).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, size=(n_tiles * N, L)).astype(np.int32))

    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=axis)

    @jax.jit
    def f(x, idx):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            out_shape=jax.ShapeDtypeStruct((n_tiles * N, L), jnp.float32),
            in_specs=[
                pl.BlockSpec((N, L), lambda i: (0, 0)),
                pl.BlockSpec((N, L), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((N, L), lambda i: (i, 0)),
        )(x, idx)

    try:
        got = np.asarray(f(x, idx))
        want = np.take_along_axis(
            np.asarray(x), np.asarray(idx).reshape(n_tiles, N, L)[0], axis=0
        )
        ok = np.allclose(got[:N], want)
        dt = timeit(lambda a, b: jnp.sum(f(a, b)), x, idx, iters=5,
                    name=f"pallas grid gather {n_tiles}x({N},{L})")
        print(f"  correct={ok}  -> {n_tiles*N*L/dt/1e6:.0f} M elem/s")
    except Exception as e:
        print(f"pallas grid gather: FAILED {type(e).__name__}: {str(e)[:300]}")


def probe_xla_gather_complex(P=22_000_000, V=2_700_000):
    """Gather element width test: if throughput is per-ELEMENT (not per-byte),
    a complex64 gather fetches two f32 corners for the price of one — the
    basis of the paired trilinear warp in ops/augment.py."""
    rng = np.random.RandomState(0)
    re = rng.randn(V).astype(np.float32)
    vol = jax.lax.complex(jnp.asarray(re), jnp.asarray(re[::-1].copy()))
    idx = jnp.asarray(rng.randint(0, V, size=(P,)).astype(np.int32))

    @jax.jit
    def f(vol, idx):
        g = vol[idx]
        return jnp.sum(jnp.real(g) + jnp.imag(g))

    dt = timeit(f, vol, idx, name=f"XLA 1D complex64 gather P={P/1e6:.0f}M")
    print(f"  -> {P/dt/1e6:.0f} M pair/s = {2*P/dt/1e6:.0f} M f32/s")


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    print("devices:", jax.devices())
    for rows in (8, 64, 1024, 8192, 36864):
        probe_pallas_dynamic_gather(rows=rows, axis=0)
    probe_pallas_dynamic_gather(rows=1024, axis=1)
    probe_pallas_dynamic_gather(rows=8192, axis=1)
    probe_pallas_dynamic_gather(rows=1024, axis=0, dtype=jnp.bfloat16)
    probe_grid_gather()
    probe_xla_gather(P=2_200_000)
    probe_xla_gather(P=22_000_000)
    probe_xla_gather_complex(P=22_000_000)
