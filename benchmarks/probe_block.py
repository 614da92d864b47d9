"""Probe the inverted-residual block's stage costs on the TPU.

Questions (round 3):
  1. Is `conv_general_dilated` for a 1x1 conv slower than an explicit
     reshape -> jnp.dot matmul at the same shapes? (Profiler showed 6.7ms
     for a 13-GFLOP / 0.9-GB matmul whose floors are 0.3ms MXU / 1.1ms HBM.)
  2. What do dgrad/wgrad of each formulation cost?
  3. What does the whole XLA block (expand+BN+relu6+dw+BN+relu6+proj) cost
     fwd and fwd+bwd, as the baseline for a fused Pallas block kernel?

Timing: state-threaded lax.fori_loop (K iters per dispatch) — per-call
timings over the axon tunnel include a ~29ms dispatch+sync floor (CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_block.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

B, D, H, W = 8, 96, 96, 38
CIN, MID, COUT = 16, 144, 24
ITERS = 20


def _sync_scalar(out):
    """Force completion by fetching ONE element, sliced on-device first.

    np.asarray(full_array) would pull the whole carry through the tunnel —
    the r4 image's host link moves ~13 MB/s, so a 806 MB carry masquerades
    as 2.8 s/iter of 'compute' (measured the hard way). Device-side [:1]
    keeps the transfer at 2 bytes."""
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf.ravel()[:1])


def timed(name, make_fn, *args):
    """make_fn(*args) -> fn where fn is jitted state-threaded loop; returns ms/iter."""
    fn = make_fn(*args)
    out = fn(*args)  # compile
    # block_until_ready does NOT block over the tunnel — force a (tiny)
    # host transfer or the timed region absorbs the remote compile.
    _sync_scalar(out)
    t0 = time.perf_counter()
    out = fn(*args)
    _sync_scalar(out)
    dt = (time.perf_counter() - t0) * 1e3 / ITERS
    print(f"{name}: {dt:.2f} ms/iter", flush=True)
    return dt


def loop(body):
    @jax.jit
    def fn(*args):
        def it(i, c):
            r = body(c, *args[1:])
            # fold a scalar back into the carry so iterations are sequential
            return c * 0.999 + 0.001 * r
        return jax.lax.fori_loop(0, ITERS, it, args[0])
    return fn


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D, H, W, CIN), jnp.bfloat16)
    w1 = jax.random.normal(key, (1, 1, 1, CIN, MID), jnp.bfloat16) * 0.1
    w1m = w1.reshape(CIN, MID)
    wdw = jax.random.normal(key, (3, 3, 3, 1, MID), jnp.bfloat16) * 0.1
    w2 = jax.random.normal(key, (1, 1, 1, MID, COUT), jnp.bfloat16) * 0.1
    w2m = w2.reshape(MID, COUT)
    seed = x * 0.0 + 1.0

    # bf16 in/out like the production model's flax convs (autodiff-safe:
    # preferred_element_type=f32 makes the cotangent f32 and the transposed
    # conv then mixes dtypes).
    def conv1x1(x_, w_):
        return jax.lax.conv_general_dilated(
            x_, w_, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    def dw(x_, w_):
        return jax.lax.conv_general_dilated(
            x_, w_.reshape(3, 3, 3, 1, MID), (1, 1, 1),
            [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=MID,
        )

    # -- 1x1 conv as conv_general_dilated --------------------------------
    xm = x  # carry same shape as x
    timed(
        "1x1 conv_general fwd (16->144)",
        lambda *a: loop(lambda c, w_: jnp.mean(conv1x1(c, w_)).astype(c.dtype)),
        xm, w1,
    )

    # -- 1x1 as reshape + dot --------------------------------------------
    def matmul_body(c, w_):
        m = c.reshape(-1, CIN)
        y = jnp.dot(m, w_, preferred_element_type=jnp.float32)
        return jnp.mean(y).astype(c.dtype)

    timed("1x1 reshape+dot fwd (16->144)", lambda *a: loop(matmul_body), xm, w1m)

    # -- with grads -------------------------------------------------------
    def g_conv(c, w_):
        def f(xx, ww):
            return jnp.mean(conv1x1(xx, ww).astype(jnp.float32) ** 2)
        gx, gw = jax.grad(f, argnums=(0, 1))(c, w_)
        return (jnp.mean(gx) + jnp.mean(gw)).astype(c.dtype)

    timed("1x1 conv_general fwd+bwd", lambda *a: loop(g_conv), xm, w1)

    def g_dot(c, w_):
        def f(xx, ww):
            y = jnp.dot(xx.reshape(-1, CIN), ww, preferred_element_type=jnp.float32)
            return jnp.mean(y ** 2)
        gx, gw = jax.grad(f, argnums=(0, 1))(c, w_)
        return (jnp.mean(gx) + jnp.mean(gw)).astype(c.dtype)

    timed("1x1 reshape+dot fwd+bwd", lambda *a: loop(g_dot), xm, w1m)

    # -- depthwise --------------------------------------------------------
    xmid = jax.random.normal(key, (B, D, H, W, MID), jnp.bfloat16)
    timed(
        "dw grouped conv fwd (144ch)",
        lambda *a: loop(lambda c, w_: jnp.mean(dw(c, w_)).astype(c.dtype)),
        xmid, wdw,
    )

    def g_dw(c, w_):
        def f(xx, ww):
            return jnp.mean(dw(xx, ww).astype(jnp.float32) ** 2)
        gx, gw = jax.grad(f, argnums=(0, 1))(c, w_)
        return (jnp.mean(gx) + jnp.mean(gw)).astype(c.dtype)

    timed("dw grouped conv fwd+bwd", lambda *a: loop(g_dw), xmid, wdw)

    # -- whole block XLA (expand+bn+relu6+dw+bn+relu6+proj+bn) ------------
    gamma1 = jnp.ones((MID,), jnp.float32)
    beta1 = jnp.zeros((MID,), jnp.float32)

    def bn(y, n):
        yf = y.astype(jnp.float32)
        mu = jnp.mean(yf, axis=(0, 1, 2, 3))
        var = jnp.mean(yf * yf, axis=(0, 1, 2, 3)) - mu * mu
        return ((yf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(y.dtype)

    def block(xx, w1_, wdw_, w2_):
        m = conv1x1(xx, w1_).astype(jnp.bfloat16)
        m = jax.nn.relu6(bn(m, 1))
        d = dw(m, wdw_).astype(jnp.bfloat16)
        d = jax.nn.relu6(bn(d, 2))
        p = conv1x1(d, w2_).astype(jnp.bfloat16)
        return bn(p, 3)

    def block_body(c, w1_, wdw_, w2_):
        return jnp.mean(block(c, w1_, wdw_, w2_).astype(jnp.float32)).astype(c.dtype)

    timed("XLA block fwd", lambda *a: loop(block_body), xm, w1, wdw, w2)

    def g_block(c, w1_, wdw_, w2_):
        def f(xx, a, b_, d_):
            return jnp.mean(block(xx, a, b_, d_).astype(jnp.float32) ** 2)
        gs = jax.grad(f, argnums=(0, 1, 2, 3))(c, w1_, wdw_, w2_)
        return sum(jnp.mean(g) for g in gs).astype(c.dtype)

    timed("XLA block fwd+bwd", lambda *a: loop(g_block), xm, w1, wdw, w2)


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print("devices:", jax.devices(), flush=True)
    main()
