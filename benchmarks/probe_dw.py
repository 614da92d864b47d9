"""Kernel-level A/B of the depthwise 3x3x3 conv at real backbone shapes:
XLA grouped conv vs Pallas streaming stencil (ops/conv3d_pallas.py),
fwd-only and fwd+bwd. Shapes from the bench config (b8, 192x192x75 input):
blocks 1-5 run at (8, 96, 96, 38, C) and blocks 7-9 at (8, 48, 48, 19, C).

All data is generated ON DEVICE (the axon tunnel transfers at ~1MB/s — a
host-side randn of these shapes stalls for minutes). Timing syncs via a tiny
host transfer (block_until_ready lies on the tunnel).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.lax as lax
import jax.numpy as jnp

from deep_staple_tpu.ops.conv3d_pallas import depthwise_conv3d_pallas


def sync1(x):
    return float(np.asarray(x.reshape(-1)[0]).astype(np.float32))


def timeit(fn, *args, iters=5, name=""):
    out = fn(*args)
    sync1(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        sync1(jax.tree.leaves(out)[0])
        ts.append(time.time() - t0)
    print(f"{name}: {np.median(ts)*1000:.2f} ms", flush=True)


def xla_dw(x, w):
    C = x.shape[-1]
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=C,
    )


def run(shape, dtype=jnp.bfloat16, bwd=True):
    B, D, H, W, C = shape
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, shape, jnp.float32).astype(dtype)
    w = jax.random.normal(k2, (3, 3, 3, 1, C), jnp.float32).astype(dtype)
    x, w = jax.device_put(x), jax.device_put(w)
    sync1(x)
    print(f"--- shape {shape} {np.dtype(dtype).name}", flush=True)

    f_x = jax.jit(xla_dw)
    f_p = jax.jit(depthwise_conv3d_pallas)
    t0 = time.time()
    b = f_x(x, w)
    sync1(b)
    print(f"  xla compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    a = f_p(x, w)
    sync1(a)
    print(f"  pallas compile {time.time()-t0:.0f}s", flush=True)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"  max|pallas - xla| = {err:.2e}", flush=True)
    timeit(f_x, x, w, name="  xla fwd")
    timeit(f_p, x, w, name="  pallas fwd")
    if not bwd:
        return

    def mk_step(f):
        def loss(x, w):
            y = f(x, w)
            return jnp.sum((y.astype(jnp.float32)) ** 2)

        g = jax.grad(loss, argnums=(0, 1))

        @jax.jit
        def step(x, w):
            gx, gw = g(x, w)
            return jnp.sum(gx.astype(jnp.float32)) + jnp.sum(gw.astype(jnp.float32))

        return step

    timeit(mk_step(xla_dw), x, w, name="  xla fwd+bwd")
    timeit(mk_step(depthwise_conv3d_pallas), x, w, name="  pallas fwd+bwd")


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print("devices:", jax.devices(), flush=True)
    run((8, 96, 96, 38, 144))
    run((8, 96, 96, 38, 192))
    run((8, 48, 48, 19, 384))
