"""Probe: int8 convolutions on v5e — is the MXU's double-rate int8 path
reachable through XLA for this model's hot conv shapes?

Motivation: the production step (446 ms) is 92% model convolutions
(profiler attribution, README), each at its probed bf16 XLA/MXU floor.
v5e's MXU runs int8 at 2x the bf16 MAC rate (394 TOPS vs 197 TFLOPS
peak), so IF `conv_general_dilated` on int8 operands with
`preferred_element_type=int32` lowers to the int8 systolic path, a
quantized-conv preset could attack the dominant bucket. This probe
measures the raw kernels only (no quantize/dequantize epilogues — those
fuse, and if the core conv isn't >=1.5x the lever is dead regardless).

Shapes: the lom expand/project pointwise convs, the him stride-1 full
conv, and the depthwise grouped conv (feature_group_count=C — the int8
path likely doesn't exist for grouped convs, but measure, don't guess).

Timing: state-threaded fori_loop (K iters/dispatch) because per-call
timings on the axon tunnel include a ~29 ms dispatch floor (CLAUDE.md).
For int operands the serialization perturbation is a data-dependent XOR
of the low bit (the float `+ acc*1e-9` trick constant-folds for ints).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.lax as lax
import jax.numpy as jnp

K_ITERS = 10

POINTWISE = [
    # (B, D, H, W, Cin, Cout) — lom expand / project hot shapes
    (8, 96, 96, 38, 24, 144),
    (8, 96, 96, 38, 144, 24),
]


def timeit(make_step, name, *args):
    run = jax.jit(make_step)
    o = run(*args)
    _ = float(np.asarray(o).astype(np.float64))
    ts = []
    for _ in range(3):
        t0 = time.time()
        o = run(*args)
        _ = float(np.asarray(o).astype(np.float64))
        ts.append(time.time() - t0)
    dt = min(ts) / K_ITERS
    print(f"  {name}: {dt * 1000:.2f} ms/op", flush=True)
    return dt


def conv_pointwise(x, w, out_t):
    return lax.conv_general_dilated(
        x, w.reshape((1, 1, 1) + w.shape), (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=out_t,
    )


def conv_full3(x, w, out_t):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=out_t,
    )


def conv_depthwise(x, w, out_t):
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=c,
        preferred_element_type=out_t,
    )


def loop_int(f, x, w, out_t):
    def step(x, w):
        def body(i, acc):
            xp = x ^ (acc & 1).astype(jnp.int8)
            y = f(xp, w, out_t)
            return y.reshape(-1)[0]

        return lax.fori_loop(0, K_ITERS, body, jnp.int32(0))

    return step


def loop_bf16(f, x, w):
    def step(x, w):
        def body(i, acc):
            xp = x + (acc * 1e-9).astype(x.dtype)
            y = f(xp, w, jnp.float32)
            return y.reshape(-1)[0]

        return lax.fori_loop(0, K_ITERS, body, jnp.float32(0.0))

    return step


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)

    for B, D, H, W, Cin, Cout in POINTWISE:
        print(f"pointwise b{B} {D}x{H}x{W} {Cin}->{Cout}:", flush=True)
        xf = rng.randn(B, D, H, W, Cin).astype(np.float32)
        wf = rng.randn(Cin, Cout).astype(np.float32)
        xb, wb = jnp.asarray(xf, jnp.bfloat16), jnp.asarray(wf, jnp.bfloat16)
        xi = jnp.asarray(rng.randint(-127, 128, xf.shape), jnp.int8)
        wi = jnp.asarray(rng.randint(-127, 128, wf.shape), jnp.int8)
        t_b = timeit(loop_bf16(conv_pointwise, xb, wb), "bf16 conv", xb, wb)
        t_i = timeit(loop_int(conv_pointwise, xi, wi, jnp.int32), "int8 conv", xi, wi)
        print(f"  -> int8/bf16 speedup {t_b / t_i:.2f}x", flush=True)

    B, D, H, W, Cin, Cout = 8, 192, 192, 75, 16, 16
    print(f"full 3x3x3 b{B} {D}x{H}x{W} {Cin}->{Cout} (him-like):", flush=True)
    xf = rng.randn(B, D, H, W, Cin).astype(np.float32)
    wf = rng.randn(3, 3, 3, Cin, Cout).astype(np.float32)
    xb, wb = jnp.asarray(xf, jnp.bfloat16), jnp.asarray(wf, jnp.bfloat16)
    xi = jnp.asarray(rng.randint(-127, 128, xf.shape), jnp.int8)
    wi = jnp.asarray(rng.randint(-127, 128, wf.shape), jnp.int8)
    t_b = timeit(loop_bf16(conv_full3, xb, wb), "bf16 conv", xb, wb)
    t_i = timeit(loop_int(conv_full3, xi, wi, jnp.int32), "int8 conv", xi, wi)
    print(f"  -> int8/bf16 speedup {t_b / t_i:.2f}x", flush=True)

    B, D, H, W, C = 8, 96, 96, 38, 144
    print(f"depthwise 3x3x3 b{B} {D}x{H}x{W} c{C}:", flush=True)
    xf = rng.randn(B, D, H, W, C).astype(np.float32)
    wf = rng.randn(3, 3, 3, 1, C).astype(np.float32)
    xb, wb = jnp.asarray(xf, jnp.bfloat16), jnp.asarray(wf, jnp.bfloat16)
    xi = jnp.asarray(rng.randint(-127, 128, xf.shape), jnp.int8)
    wi = jnp.asarray(rng.randint(-127, 128, wf.shape), jnp.int8)
    t_b = timeit(loop_bf16(conv_depthwise, xb, wb), "bf16 conv", xb, wb)
    try:
        t_i = timeit(loop_int(conv_depthwise, xi, wi, jnp.int32), "int8 conv", xi, wi)
        print(f"  -> int8/bf16 speedup {t_b / t_i:.2f}x", flush=True)
    except Exception as e:  # noqa: BLE001 — probe records unsupported paths
        print(f"  int8 depthwise: FAILED ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
