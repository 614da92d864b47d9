"""Probe: 1x1x1 convs as conv_general_dilated vs explicit matmul on v5e.

BENCH_r02 fast-bf16 profile: the inverted-residual expand/project 1x1 convs
run far off their memory floor (expand 24->144 @ 8x96x96x38: fwd 8.6ms,
bwd 11.7ms vs ~1.2ms HBM floor). Hypothesis: XLA's conv emitter handles the
tiny contraction dim poorly and an explicit reshape+dot lowers to the matmul
emitter instead.

Measures fwd and fwd+bwd for both formulations at the model's hot shapes.
Looped state-threaded timing (tunnel dispatch floor ~29ms — CLAUDE.md).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.lax as lax
import jax.numpy as jnp

K_ITERS = 10

SHAPES = [
    # (B, D, H, W, Cin, Cout) — lom expand / project hot shapes
    (8, 96, 96, 38, 24, 144),
    (8, 96, 96, 38, 144, 24),
    (8, 96, 96, 38, 32, 192),
    (8, 96, 96, 38, 16, 96),
]


def conv_form(x, w):
    return lax.conv_general_dilated(
        x, w.reshape((1, 1, 1) + w.shape), (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def matmul_form(x, w):
    return jnp.einsum("bdhwc,cf->bdhwf", x, w)


def timeit_fn(make_step, name, *args):
    run = jax.jit(make_step)
    o = run(*args)
    _ = float(np.asarray(jax.tree.leaves(o)[0].reshape(-1)[0]).astype(np.float32))
    ts = []
    for _ in range(3):
        t0 = time.time()
        o = run(*args)
        _ = float(np.asarray(jax.tree.leaves(o)[0].reshape(-1)[0]).astype(np.float32))
        ts.append(time.time() - t0)
    dt = min(ts) / K_ITERS
    print(f"  {name}: {dt*1000:.2f} ms/op", flush=True)
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    for B, D, H, W, Cin, Cout in SHAPES:
        print(f"shape b{B} {D}x{H}x{W} {Cin}->{Cout} bf16:", flush=True)
        x = jnp.asarray(rng.randn(B, D, H, W, Cin).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.randn(Cin, Cout).astype(np.float32)).astype(jnp.bfloat16)

        for name, f in (("conv  ", conv_form), ("matmul", matmul_form)):

            def fwd_step(x, w, f=f):
                def body(i, acc):
                    y = f(x + acc.astype(x.dtype) * 1e-9, w)
                    return jnp.float32(0.0) + y.astype(jnp.float32).reshape(-1)[0]

                return lax.fori_loop(0, K_ITERS, body, jnp.float32(0.0))

            timeit_fn(fwd_step, name + " fwd", x, w)

            def bwd_step(x, w, f=f):
                def body(i, acc):
                    def loss(w_):
                        y = f(x + acc.astype(x.dtype) * 1e-9, w_)
                        return jnp.sum(y.astype(jnp.float32) * 1e-9)

                    g = jax.grad(loss)(w)
                    return acc + g.astype(jnp.float32).reshape(-1)[0]

                return lax.fori_loop(0, K_ITERS, body, jnp.float32(0.0))

            timeit_fn(bwd_step, name + " gradw", x, w)

            def bwd_full(x, w, f=f):
                def body(i, acc):
                    def loss(x_, w_):
                        y = f(x_, w_)
                        return jnp.sum(y.astype(jnp.float32) * 1e-9)

                    gx, gw = jax.grad(loss, argnums=(0, 1))(
                        x + acc.astype(x.dtype) * 1e-9, w
                    )
                    return acc + gw.astype(jnp.float32).reshape(-1)[0] + gx.astype(
                        jnp.float32
                    ).reshape(-1)[0]

                return lax.fori_loop(0, K_ITERS, body, jnp.float32(0.0))

            timeit_fn(bwd_full, name + " grad(x,w)", x, w)


if __name__ == "__main__":
    main()
