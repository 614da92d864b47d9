"""Probe: can a Pallas depthwise 3x3x3 stencil beat 0.5 effective TFLOP/s?

ops/conv3d_pallas.py (the recorded dead end) hits 43.9 ms at
(8,96,96,38,144) = ~0.5 TFLOP/s effective on the VPU. Hypothesis: the cost
is NOT the 27 f32 FMAs but the 27 per-tap `slab[z+dz, dy:dy+H, dx:dx+W, :]`
slices — the dx slice starts at a sublane-misaligned offset (W=38 is not a
multiple of the 8-sublane tile), so Mosaic materializes a relayout copy of
the whole (H, W, C) plane per tap.

Variants probed (same halo-ref streaming structure as the old kernel):
  A. slice-per-tap (the old kernel's inner loop) — baseline.
  B. roll-FMA: dx handled by `pltpu.roll` (sublane rotate) at full padded
     width, dy/dz by static leading-dim slices (no minor-dim relayout);
     ONE interior slice per z-plane at the end instead of 27.
  C. roll-FMA, padded-W layout: input and output carry W+2 columns with
     zeroed borders (the fused-block pipeline form) — no interior slice at
     all, borders re-zeroed by a single multiplicative mask.
  D. variant C with bf16 accumulation (VPU bf16 rate test).

The decision this probe feeds: a fused inverted-residual block kernel
(expand MXU + dw VPU + project MXU, activations VMEM-resident) is only
worth building if the dw stencil can run compute-bound at >=2 TFLOP/s —
see VERDICT.md round-3 item 1 and benchmarks/roofline.py.

CPU check: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python -u benchmarks/probe_vpu_dw.py --verify-only
TPU:       PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_vpu_dw.py
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _specs(D, TZ, H, W, ct):
    def lo(b, c, t):
        return (b * D + jnp.clip(t * TZ - 1, 0, D - 1), 0, 0, c)

    def main(b, c, t):
        return (b * (D // TZ) + t, 0, 0, c)

    def hi(b, c, t):
        return (b * D + jnp.clip(t * TZ + TZ, 0, D - 1), 0, 0, c)

    return [
        pl.BlockSpec((1, H, W, ct), lo),
        pl.BlockSpec((TZ, H, W, ct), main),
        pl.BlockSpec((1, H, W, ct), hi),
        pl.BlockSpec((27, ct), lambda b, c, t: (0, c)),
    ]


def _zmask(w_row, z, dz, TZ, t, nT):
    f32 = w_row.dtype
    if z == 0 and dz == 0:
        return w_row * (t > 0).astype(f32)
    if z == TZ - 1 and dz == 2:
        return w_row * (t < nT - 1).astype(f32)
    return w_row


# --- variant A: per-tap slicing (old kernel inner loop) ----------------------


def _kern_slice(lo_ref, main_ref, hi_ref, w_ref, o_ref, *, TZ, H, W):
    t = pl.program_id(2)
    nT = pl.num_programs(2)
    slab = jnp.concatenate(
        [lo_ref[...], main_ref[...], hi_ref[...]], axis=0
    ).astype(jnp.float32)
    slab = jnp.pad(slab, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for z in range(TZ):
        acc = jnp.zeros((H, W, o_ref.shape[-1]), jnp.float32)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    w_row = _zmask(w_ref[dz * 9 + dy * 3 + dx, :], z, dz, TZ, t, nT)
                    acc = acc + slab[z + dz, dy : dy + H, dx : dx + W, :] * w_row
        o_ref[z] = acc.astype(o_ref.dtype)


# --- variant B: roll-FMA, interior slice once per z --------------------------


def _kern_roll(lo_ref, main_ref, hi_ref, w_ref, o_ref, *, TZ, H, W):
    t = pl.program_id(2)
    nT = pl.num_programs(2)
    slab = jnp.concatenate(
        [lo_ref[...], main_ref[...], hi_ref[...]], axis=0
    ).astype(jnp.float32)
    # pad x by 1 on each side once (W -> W+2), y handled by leading-dim pad.
    slab = jnp.pad(slab, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Wp = W + 2
    for z in range(TZ):
        acc = jnp.zeros((H, Wp, o_ref.shape[-1]), jnp.float32)
        for dz in range(3):
            for dy in range(3):
                plane = slab[z + dz, dy : dy + H]  # leading-dim slice: no relayout
                for dx in range(3):
                    w_row = _zmask(w_ref[dz * 9 + dy * 3 + dx, :], z, dz, TZ, t, nT)
                    sh = (1 - dx) % Wp
                    shifted = pltpu.roll(plane, sh, 1) if sh else plane
                    acc = acc + shifted * w_row
        o_ref[z] = acc[:, 1 : W + 1, :].astype(o_ref.dtype)


# --- variant C/D: roll-FMA on padded-W layout (no interior slice) ------------


def _kern_rollpad(lo_ref, main_ref, hi_ref, w_ref, o_ref, *, TZ, H, W, acc_dtype):
    """In/out carry Wp = W+2 columns; borders (x=0, x=Wp-1) are zero on input
    and re-zeroed on output by a single multiplicative mask."""
    t = pl.program_id(2)
    nT = pl.num_programs(2)
    Wp = W + 2
    slab = jnp.concatenate(
        [lo_ref[...], main_ref[...], hi_ref[...]], axis=0
    ).astype(acc_dtype)
    slab = jnp.pad(slab, ((0, 0), (1, 1), (0, 0), (0, 0)))  # y only
    xcol = jax.lax.broadcasted_iota(jnp.int32, (1, Wp, 1), 1)
    border = jnp.logical_and(xcol > 0, xcol < Wp - 1).astype(acc_dtype)
    for z in range(TZ):
        acc = jnp.zeros((H, Wp, o_ref.shape[-1]), acc_dtype)
        for dz in range(3):
            for dy in range(3):
                plane = slab[z + dz, dy : dy + H]
                for dx in range(3):
                    w_row = _zmask(
                        w_ref[dz * 9 + dy * 3 + dx, :].astype(acc_dtype),
                        z, dz, TZ, t, nT,
                    )
                    sh = (1 - dx) % Wp
                    shifted = pltpu.roll(plane, sh, 1) if sh else plane
                    acc = acc + shifted * w_row
        o_ref[z] = (acc * border).astype(o_ref.dtype)


def _run_variant(kern, x, w27, TZ, padded_w: bool):
    B, D, H, W, C = x.shape
    ct = min(C, 128)
    n_ct = -(-C // ct)
    xf = x.reshape(B * D, H, W, C)
    return pl.pallas_call(
        kern,
        grid=(B, n_ct, D // TZ),
        in_specs=_specs(D, TZ, H, W, ct),
        out_specs=pl.BlockSpec(
            (TZ, H, W, ct), lambda b, c, t: (b * (D // TZ) + t, 0, 0, c)
        ),
        out_shape=jax.ShapeDtypeStruct((B * D, H, W, C), x.dtype),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xf, xf, xf, w27).reshape(B, D, H, W, C)


def _pick_tz(D):
    for tz in (8, 6, 4, 3, 2):
        if D % tz == 0:
            return tz
    return 1


def make_fns(shape):
    B, D, H, W, C = shape
    TZ = _pick_tz(D)
    Wp = W + 2

    def f_slice(x, w27):
        return _run_variant(partial(_kern_slice, TZ=TZ, H=H, W=W), x, w27, TZ, False)

    def f_roll(x, w27):
        return _run_variant(partial(_kern_roll, TZ=TZ, H=H, W=W), x, w27, TZ, False)

    def f_rollpad(xp, w27, acc_dtype=jnp.float32):
        # xp: (B, D, H, Wp, C) with zero borders
        return _run_variant(
            partial(_kern_rollpad, TZ=TZ, H=H, W=W, acc_dtype=acc_dtype),
            xp, w27, TZ, True,
        )

    return f_slice, f_roll, f_rollpad


def xla_dw(x, w27):
    C = x.shape[-1]
    w = w27.reshape(3, 3, 3, 1, C).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=C,
    )


def verify():
    shape = (1, 6, 10, 9, 8)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w27 = jnp.asarray(rng.randn(27, shape[-1]).astype(np.float32))
    ref = xla_dw(x, w27)
    f_slice, f_roll, f_rollpad = make_fns(shape)
    a = f_slice(x, w27)
    b = f_roll(x, w27)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    cp = f_rollpad(xp, w27)
    c = cp[:, :, :, 1:-1, :]
    for name, out in (("slice", a), ("roll", b), ("rollpad", c)):
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"{name}: max|err| = {err:.2e}")
        assert err < 1e-4, name
    # border columns must come back exactly zero
    assert float(jnp.max(jnp.abs(cp[:, :, :, 0, :]))) == 0.0
    assert float(jnp.max(jnp.abs(cp[:, :, :, -1, :]))) == 0.0
    print("verify OK")


ITERS = 20


def time_fn(name, fn, x, w27, flops):
    @jax.jit
    def loop(c):
        def body(i, c2):
            y = fn(c2, w27)
            return y * jnp.float32(0.999).astype(c2.dtype)

        return jax.lax.fori_loop(0, ITERS, body, c)

    out = loop(x)
    np.asarray(jax.device_get(out.ravel()[:1]))  # scalar sync only (slow host link)
    t0 = time.perf_counter()
    out = loop(x)
    np.asarray(jax.device_get(out.ravel()[:1]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.2f} ms/conv  ({flops/dt/1e12:.2f} eff TFLOP/s)", flush=True)


def main():
    shape = (8, 96, 96, 38, 144)
    B, D, H, W, C = shape
    flops = 27 * 2 * B * D * H * W * C
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32).astype(jnp.bfloat16)
    w27 = jax.random.normal(key, (27, C), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    f_slice, f_roll, f_rollpad = make_fns(shape)
    print(f"shape {shape}, {flops/1e9:.1f} GFLOP/conv", flush=True)
    time_fn("xla grouped ", jax.jit(xla_dw), x, w27, flops)
    time_fn("A slice-FMA ", jax.jit(f_slice), x, w27, flops)
    time_fn("B roll-FMA  ", jax.jit(f_roll), x, w27, flops)
    time_fn("C rollpad   ", jax.jit(f_rollpad), xp, w27, flops)
    time_fn("D rollpad bf16acc",
            jax.jit(partial(f_rollpad, acc_dtype=jnp.bfloat16)), xp, w27, flops)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify-only", action="store_true")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if args.verify_only:
        verify()
    else:
        print("devices:", jax.devices(), flush=True)
        main()
