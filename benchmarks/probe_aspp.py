"""Are the ASPP dilated convs on the best emitter? MEASURED ANSWER: yes.

v5e results (8x48x48x19, 64->128 bf16, state-threaded loops): XLA's dilated
conv beats the 27-tap shifted-matmul form at every rate and direction —
fwd r=2: 4.46 vs 9.95 ms; fwd r=16: 3.62 vs 10.26 ms; fwd+bwd r=2: 4.89 vs
5.42 ms; fwd+bwd r=16: 5.60 vs 6.52 ms (skip-dead pruning: no effect, no tap
is fully dead at these rates). ASPP3D stays on `nn.Conv` with
kernel_dilation; the ~8%-of-step ASPP bucket is at its emitter floor.

Profiler attribution (round 3) puts ASPP at ~58ms of the ~720ms production
step. The four branches are 3x3x3 convs with kernel_dilation r in
{2,4,8,16} at (8,48,48,19,64)->128 bf16 — ~15.5 GFLOP each fwd, which at
even 50 TFLOPS would be sub-ms; something in the dilated-conv lowering is
expensive (at rate 16 the z taps only touch 3/19 of positions, the rest is
padding).

Variants per rate (fwd and fwd+bwd, state-threaded fori_loop timing per
CLAUDE.md):
  1. XLA conv_general_dilated with kernel_dilation=r (what ASPP3D does now),
  2. 27-tap form: pad + static slice + dot_general per tap (27 pointwise
     matmuls the MXU likes; XLA fuses the shifts into the matmul operands),
  3. same but skipping taps that are fully outside (static, rate 16 in z).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.lax as lax
import jax.numpy as jnp

B, D, H, W, CIN, COUT = 8, 48, 48, 19, 64, 128
K = 8
DT = jnp.bfloat16


def conv_xla(x, w, rate):
    pad = rate
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(pad, pad)] * 3, rhs_dilation=(rate,) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv_taps(x, w, rate, skip_dead=False):
    r = rate
    b, d, h, ww, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (r, r), (0, 0)))
    out = None
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                if skip_dead and (
                    (dz != 1 and r >= d) or (dy != 1 and r >= h) or (dx != 1 and r >= ww)
                ):
                    continue
                sl = lax.dynamic_slice(
                    xp, (0, dz * r, dy * r, dx * r, 0), (b, d, h, ww, cin)
                )
                term = lax.dot_general(
                    sl, w[dz, dy, dx], (((4,), (0,)), ((), ())),
                    preferred_element_type=sl.dtype,
                )
                out = term if out is None else out + term
    return out


def timeit(name, fn, x, w, grad=False):
    if grad:
        def obj(x_, w_):
            return jnp.sum(fn(x_, w_).astype(jnp.float32) * 1e-6)

        gf = jax.grad(obj, argnums=(0, 1))

        @jax.jit
        def run(x, w):
            def body(i, c):
                gx, gw = gf(x + (c * 1e-20).astype(x.dtype), w)
                return c + jnp.sum(gw.astype(jnp.float32)) * 1e-9
            return lax.fori_loop(0, K, body, jnp.float32(0))
    else:
        @jax.jit
        def run(x, w):
            def body(i, c):
                y = fn(x + (c * 1e-20).astype(x.dtype), w)
                return c + y.astype(jnp.float32).reshape(-1)[0] * 1e-9
            return lax.fori_loop(0, K, body, jnp.float32(0))

    try:
        o = run(x, w)
        _ = float(np.asarray(o))
        ts = []
        for _k in range(3):
            t0 = time.time()
            o = run(x, w)
            _ = float(np.asarray(o))
            ts.append(time.time() - t0)
        print(f"RESULT {name}: {min(ts)/K*1000:.2f} ms/op", flush=True)
    except Exception as e:
        print(f"RESULT {name}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, D, H, W, CIN).astype(np.float32), DT)
    w = jnp.asarray(rng.randn(3, 3, 3, CIN, COUT).astype(np.float32), DT)

    # numerics cross-check (f32, small)
    xs = jnp.asarray(rng.randn(1, 10, 9, 8, 4).astype(np.float32))
    ws = jnp.asarray(rng.randn(3, 3, 3, 4, 6).astype(np.float32))
    import functools

    for r in (2, 4):
        ref = np.asarray(conv_xla(xs, ws, r))
        for nm, f in (("taps", conv_taps),):
            got = np.asarray(f(xs, ws, r))
            err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
            print(f"numerics {nm} r={r}: rel err {err:.2e}", flush=True)

    for r in (2, 16):
        timeit(f"xla  r={r:2d} fwd    ", functools.partial(conv_xla, rate=r), x, w)
        timeit(f"taps r={r:2d} fwd    ", functools.partial(conv_taps, rate=r), x, w)
        timeit(f"xla  r={r:2d} fwd+bwd", functools.partial(conv_xla, rate=r), x, w, grad=True)
        timeit(f"taps r={r:2d} fwd+bwd", functools.partial(conv_taps, rate=r), x, w, grad=True)
    timeit("taps r=16 fwd skip-dead",
           functools.partial(conv_taps, rate=16, skip_dead=True), x, w)
    timeit("taps r=16 f+b skip-dead",
           functools.partial(conv_taps, rate=16, skip_dead=True), x, w, grad=True)


if __name__ == "__main__":
    main()
