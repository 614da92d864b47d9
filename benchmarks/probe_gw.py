"""Is grad_w of the grouped depthwise conv worth a custom kernel?

probe_conv_bwd.py established grad_x is optimal in XLA (10.6 ms, same as the
forward). The full autodiff backward was attributed ~24 ms/conv, leaving
~13 ms for grad_w — an elementwise-multiply+reduce whose HBM speed-of-light
(read x + g once each, 2x540MB bf16) is ~2.7 ms. Candidates:

  1. XLA autodiff grad_w alone (baseline),
  2. XLA "tap-sum" form: gw[t,c] = sum_p shift_t(x)[p,c] * g[p,c] expressed
     as 27 multiply-reduce ops (lets XLA fuse the shifts),
  3. the existing Pallas gw kernel (ops/conv3d_pallas._dw_pallas_gw_impl).

Timing per CLAUDE.md: state-threaded fori_loop (K iters/dispatch) — per-call
timings include the ~29ms tunnel floor.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.lax as lax
import jax.numpy as jnp

from deep_staple_tpu.ops.conv3d_pallas import _dw_pallas_gw_impl

B, D, H, W, C = 8, 96, 96, 38, 144
K = 10
DT = jnp.bfloat16


def dw(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=C,
    )


def gw_autodiff(x, w, g):
    _, vjp = jax.vjp(lambda w_: dw(x, w_), w)
    return vjp(g)[0]


def gw_tapsum(x, w, g):
    # pad x so shifts are static slices; accumulate (27, C) in f32.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    gf = g.astype(jnp.float32)
    rows = []
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                xs = lax.dynamic_slice(xp, (0, dz, dy, dx, 0), x.shape)
                rows.append(jnp.sum(xs.astype(jnp.float32) * gf, axis=(0, 1, 2, 3)))
    return jnp.stack(rows).reshape(3, 3, 3, 1, C).astype(w.dtype)


def gw_pallas(x, w, g):
    return _dw_pallas_gw_impl(x, g).reshape(3, 3, 3, 1, C).astype(w.dtype)


def timeit(fn, name, x, w, g):
    @jax.jit
    def run(x, w, g):
        # grad_w is linear in (x, g) and independent of w, so the loop must
        # thread the carry through an *input* or XLA hoists the whole op out:
        # g + s*1e-20 serializes iterations (costs one extra elementwise pass
        # over g per iter, identical for every variant).
        def body(i, s):
            gp = g + (s * 1e-20).astype(g.dtype)  # keeps g's dtype
            gw = fn(x, w, gp)
            return s + jnp.sum(gw.astype(jnp.float32)) * 1e-9
        return lax.fori_loop(0, K, body, jnp.float32(0))

    try:
        o = run(x, w, g)
        _ = float(np.asarray(o))
        ts = []
        for _ in range(3):
            t0 = time.time()
            o = run(x, w, g)
            _ = float(np.asarray(o))
            ts.append(time.time() - t0)
        dt = min(ts) / K
        print(f"RESULT {name}: {dt*1000:.2f} ms/op", flush=True)
    except Exception as e:
        print(f"RESULT {name}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, D, H, W, C).astype(np.float32), DT)
    g = jnp.asarray(rng.randn(B, D, H, W, C).astype(np.float32), DT)
    w = jnp.asarray(rng.randn(3, 3, 3, 1, C).astype(np.float32), DT)

    # numerics cross-check at tiny shape first (f32)
    xs = jnp.asarray(rng.randn(2, 6, 6, 5, C).astype(np.float32))
    gs = jnp.asarray(rng.randn(2, 6, 6, 5, C).astype(np.float32))
    ws = jnp.asarray(rng.randn(3, 3, 3, 1, C).astype(np.float32))
    ref = np.asarray(gw_autodiff(xs, ws, gs))
    for name, fn in (("tapsum", gw_tapsum), ("pallas", gw_pallas)):
        got = np.asarray(fn(xs, ws, gs))
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"numerics {name}: rel err {err:.2e}", flush=True)

    timeit(gw_autodiff, "gw autodiff   ", x, w, g)
    timeit(gw_tapsum, "gw tapsum     ", x, w, g)
    timeit(gw_pallas, "gw pallas     ", x, w, g)
    # context: forward for scale
    def fwd(x, w, g):
        return dw(x, w)

    @jax.jit
    def runf(x, w, g):
        def body(i, v):
            return dw(v, w) * 0.999
        return lax.fori_loop(0, K, body, x)

    o = runf(x, w, g)
    _ = float(np.asarray(o.reshape(-1)[0].astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        o = runf(x, w, g)
        _ = float(np.asarray(o.reshape(-1)[0].astype(jnp.float32)))
        ts.append(time.time() - t0)
    print(f"RESULT fwd (context): {min(ts)/K*1000:.2f} ms/op", flush=True)


if __name__ == "__main__":
    main()
