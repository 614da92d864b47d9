"""Is XLA's autodiff of the grouped depthwise conv slower than the
mathematically identical forward-form adjoint?

For stride-1 'same' depthwise conv: grad_x = depthwise_conv(g, flip(w)) —
exactly the same op shape as the forward.

MEASURED ANSWER: no — XLA's autodiff grad_x is already optimal
(10.61 ms/op autodiff vs 10.69 ms/op forward-form, looped on v5e); the
in-model 24ms "transpose conv" attribution covers grad_x AND grad_w
together. No custom conv VJP is warranted.

Looped state-threaded timing (tunnel dispatch floor ~29ms — CLAUDE.md).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.lax as lax
import jax.numpy as jnp

B, D, H, W, C = 8, 96, 96, 38, 144
K = 10


def dw(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=C,
    )


def gx_autodiff(x, w, g):
    _, vjp = jax.vjp(lambda x_: dw(x_, w), x)
    return vjp(g)[0]


def gx_fwdform(x, w, g):
    wf = w[::-1, ::-1, ::-1]
    return dw(g, wf)


def timeit(fn, name, *args):
    @jax.jit
    def run(x, w, g):
        def body(i, v):
            return fn(v, w, g) * 0.999
        return lax.fori_loop(0, K, body, x)

    o = run(*args)
    _ = float(np.asarray(o.reshape(-1)[0]).astype(np.float32))
    ts = []
    for _ in range(3):
        t0 = time.time()
        o = run(*args)
        _ = float(np.asarray(o.reshape(-1)[0]).astype(np.float32))
        ts.append(time.time() - t0)
    print(f"{name}: {np.median(ts)/K*1000:.2f} ms/op", flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print("devices:", jax.devices(), flush=True)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (B, D, H, W, C), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(k2, (3, 3, 3, 1, C), jnp.float32).astype(jnp.bfloat16)
    g = jax.random.normal(k3, (B, D, H, W, C), jnp.float32).astype(jnp.bfloat16)

    a = jax.jit(gx_autodiff)(x, w, g)
    b = jax.jit(gx_fwdform)(x, w, g)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"gx fwd-form vs autodiff max|diff| = {err:.2e}", flush=True)

    timeit(lambda v, w, g: dw(v, w), "dw fwd", x, w, g)
    timeit(gx_autodiff, "gx autodiff", x, w, g)
    timeit(gx_fwdform, "gx fwd-form", x, w, g)


if __name__ == "__main__":
    main()
