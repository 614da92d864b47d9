"""Probe the him stage (backbone blocks 0-1) vs a space-to-depth reformulation.

VERDICT r3 #6: blocks 0-1 run at near-full resolution with 1-96 channels;
channel counts below the 128-lane width are lane-padded, inflating the HBM
traffic of every op between the convs. Hypothesis: folding the 2x2 in-plane
neighborhood into channels (space-to-depth) multiplies the channel dim by 4
(32 -> 128 fills the lanes exactly) at 1/4 the spatial positions.

The folded formulations are EXACT algebraic rewrites, constructed by weight
re-indexing and verified element-wise (--verify-only, runs on CPU):

* block-0 full conv k3 s2 (1ch in): on the (H/2, W/2, D, 4) folded input it
  becomes k(2,2,3), stride (1,1,2), pad ((1,0),(1,0),(1,1)).
* stride-1 depthwise k3 on a CHANNEL-MAJOR folded tensor (channels ordered
  [c*4 + phase]): grouped conv, feature_group_count=C, each group 4 phases
  in -> 4 phases out, kernel 3x3x3 (a 3-tap stride-1 window spans both
  parities, so the folded kernel keeps size 3 with cross-phase taps).
* 1x1 convs: phase-local; realized as a DENSE (4Cin -> 4Cout) kernel with
  zero off-phase blocks (4x the logical MXU FLOPs, zero relayouts).
* BN: phase-group stats (reduce over positions AND the 4 phases per
  original channel) keep exact parity with the unfolded layout.

Timing: state-threaded lax.fori_loop (per-call timings over the tunnel
include a ~29ms dispatch floor — CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_him.py
CPU:   PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python -u benchmarks/probe_him.py --verify-only
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

B, H, W, D = 8, 192, 192, 75
ITERS = 10

C0_MID, C0_OUT, C1_MID, C1_OUT = 32, 16, 96, 16  # lraspp3d.py:42-44


# ---------------------------------------------------------------------------
# channel-major space-to-depth (2x2 in-plane; channels ordered [c*4 + phase])
# ---------------------------------------------------------------------------


def s2d(x):
    b, h, w, d, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, d, c)
    x = x.transpose(0, 1, 3, 5, 6, 2, 4)  # (b, h2, w2, d, c, ph, pw)
    return x.reshape(b, h // 2, w // 2, d, c * 4)


def d2s(x):
    b, h2, w2, d, c4 = x.shape
    x = x.reshape(b, h2, w2, d, c4 // 4, 2, 2)
    x = x.transpose(0, 1, 5, 2, 6, 3, 4)
    return x.reshape(b, h2 * 2, w2 * 2, d, c4 // 4)


def fold_w_full_s2(wt):
    """(3,3,3,1,Co) stride-2 kernel -> folded (2,2,3,4,Co), input phases
    [2*ph+pw] (channel-major with Cin=1). Tap dh in {-1,0,1} at output h2
    reads original row 2*h2+dh -> (folded row, phase): (-1) -> (h2-1, 1),
    (0) -> (h2, 0), (+1) -> (h2, 1); folded kernel rows {h2-1, h2} with
    pad (1, 0)."""
    co = wt.shape[-1]
    out = np.zeros((2, 2, 3, 4, co), np.float32)
    place = {0: (0, 1), 1: (1, 0), 2: (1, 1)}
    for dh in range(3):
        kh, ph = place[dh]
        for dw_ in range(3):
            kw, pw = place[dw_]
            out[kh, kw, :, 2 * ph + pw, :] = wt[dh, dw_, :, 0, :]
    return out


def fold_w_dw_s1(wt, c):
    """(3,3,3,1,C) stride-1 depthwise kernel -> folded grouped (3,3,3,4,4C)
    kernel (channel-major, feature_group_count=C).

    Folded output phase (ph_o, pw_o) at folded row h2 is original row
    2*h2+ph_o; tap dh reads 2*h2+ph_o+dh = folded row h2 + (ph_o+dh)//2,
    input phase (ph_o+dh)%2. Offsets span {-1,0,1} -> kernel size 3, pad 1.
    """
    out = np.zeros((3, 3, 3, 4, 4 * c), np.float32)
    for ph_o in (0, 1):
        for pw_o in (0, 1):
            p_out = 2 * ph_o + pw_o
            for dh in (-1, 0, 1):
                a = ph_o + dh
                kh, ph_i = a // 2 + 1, a % 2
                for dw_ in (-1, 0, 1):
                    bb = pw_o + dw_
                    kw, pw_i = bb // 2 + 1, bb % 2
                    p_in = 2 * ph_i + pw_i
                    for ci in range(c):
                        out[kh, kw, :, p_in, ci * 4 + p_out] += wt[
                            dh + 1, dw_ + 1, :, 0, ci
                        ]
    return out


def fold_w_pointwise(wt):
    """(1,1,1,Cin,Cout) -> dense (1,1,1,4Cin,4Cout) with zero off-phase
    blocks (channel-major on both sides)."""
    cin, cout = wt.shape[3], wt.shape[4]
    out = np.zeros((1, 1, 1, 4 * cin, 4 * cout), np.float32)
    for p in range(4):
        out[0, 0, 0, p::4, p::4] = wt[0, 0, 0]
    return out


def conv(x, wt, stride, pad, groups=1):
    return jax.lax.conv_general_dilated(
        x, wt.astype(x.dtype), stride, pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=groups,
    )


def bn_act(y, folded: bool, act: bool):
    yf = y.astype(jnp.float32)
    if folded:
        c4 = y.shape[-1]
        g = yf.reshape(yf.shape[:-1] + (c4 // 4, 4))
        mu = jnp.mean(g, axis=(0, 1, 2, 3, 5), keepdims=True)
        var = jnp.mean((g - mu) ** 2, axis=(0, 1, 2, 3, 5), keepdims=True)
        yf = ((g - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(yf.shape)
    else:
        mu = jnp.mean(yf, axis=(0, 1, 2, 3))
        var = jnp.mean((yf - mu) ** 2, axis=(0, 1, 2, 3))
        yf = (yf - mu) * jax.lax.rsqrt(var + 1e-5)
    if act:
        yf = jax.nn.relu6(yf)
    return yf.astype(y.dtype)


def make_weights(key, dtype=np.float32):
    rng = np.random.RandomState(0)
    mk = lambda *sh: (rng.randn(*sh) * 0.15).astype(dtype)
    return {
        "w0_full": mk(3, 3, 3, 1, C0_MID),
        "w0_dw": mk(3, 3, 3, 1, C0_MID),
        "w0_proj": mk(1, 1, 1, C0_MID, C0_OUT),
        "w1_exp": mk(1, 1, 1, C0_OUT, C1_MID),
        "w1_dw": mk(3, 3, 3, 1, C1_MID),
        "w1_proj": mk(1, 1, 1, C1_MID, C1_OUT),
    }


def fold_weights(wts):
    return {
        "w0_full": fold_w_full_s2(wts["w0_full"]),
        "w0_dw": fold_w_dw_s1(wts["w0_dw"], C0_MID),
        "w0_proj": fold_w_pointwise(wts["w0_proj"]),
        "w1_exp": fold_w_pointwise(wts["w1_exp"]),
        "w1_dw": fold_w_dw_s1(wts["w1_dw"], C1_MID),
        "w1_proj": fold_w_pointwise(wts["w1_proj"]),
    }


P1 = [(1, 1)] * 3


def him_baseline(x, w):
    y = bn_act(conv(x, jnp.asarray(w["w0_full"]), (2, 2, 2), P1), False, True)
    y = bn_act(conv(y, jnp.asarray(w["w0_dw"]), (1, 1, 1), P1, groups=C0_MID), False, True)
    y = bn_act(conv(y, jnp.asarray(w["w0_proj"]), (1, 1, 1), "VALID"), False, False)
    r = y
    y = bn_act(conv(y, jnp.asarray(w["w1_exp"]), (1, 1, 1), "VALID"), False, True)
    y = bn_act(conv(y, jnp.asarray(w["w1_dw"]), (1, 1, 1), P1, groups=C1_MID), False, True)
    y = bn_act(conv(y, jnp.asarray(w["w1_proj"]), (1, 1, 1), "VALID"), False, False)
    return y + r


def him_folded(x, wf):
    xf = s2d(x)  # (B, 96, 96, 75, 4)
    y = conv(xf, jnp.asarray(wf["w0_full"]), (1, 1, 2), [(1, 0), (1, 0), (1, 1)])
    y = s2d(y)  # (B, 48, 48, 38, 128) channel-major
    y = bn_act(y, True, True)
    y = bn_act(conv(y, jnp.asarray(wf["w0_dw"]), (1, 1, 1), P1, groups=C0_MID), True, True)
    y = bn_act(conv(y, jnp.asarray(wf["w0_proj"]), (1, 1, 1), "VALID"), True, False)
    r = y
    y = bn_act(conv(y, jnp.asarray(wf["w1_exp"]), (1, 1, 1), "VALID"), True, True)
    y = bn_act(conv(y, jnp.asarray(wf["w1_dw"]), (1, 1, 1), P1, groups=C1_MID), True, True)
    y = bn_act(conv(y, jnp.asarray(wf["w1_proj"]), (1, 1, 1), "VALID"), True, False)
    return d2s(y + r)


def verify():
    """Element-wise equality of baseline vs folded on small f32 shapes."""
    wts = make_weights(jax.random.PRNGKey(0))
    wf = fold_weights(wts)
    rng = np.random.RandomState(1)
    xs = jnp.asarray(rng.randn(2, 16, 16, 9, 1).astype(np.float32))

    a = np.asarray(him_baseline(xs, wts))
    b = np.asarray(him_folded(xs, wf))
    np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)
    print("him_folded == him_baseline (f32, rtol 3e-4): OK", flush=True)


def time_fn(name, body, x):
    @jax.jit
    def fn(c):
        return jax.lax.fori_loop(
            0, ITERS, lambda i, c2: c2 * 0.999 + 0.001 * jnp.mean(body(c2)).astype(c2.dtype), x
        )

    # sync via ONE element sliced on-device: block_until_ready is unreliable
    # over the tunnel, and np.asarray(full carry) would drag the whole array
    # through the ~13 MB/s host link (r4 image), swamping the timing.
    out = fn(x)
    np.asarray(out.ravel()[:1])
    t0 = time.perf_counter()
    out = fn(x)
    np.asarray(out.ravel()[:1])
    dt = (time.perf_counter() - t0) * 1e3 / ITERS
    print(f"{name}: {dt:.2f} ms/iter", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify-only", action="store_true")
    args = ap.parse_args()
    if args.verify_only:
        verify()
        return

    wts = make_weights(jax.random.PRNGKey(0))
    wf = fold_weights(wts)
    x = jnp.asarray(np.random.RandomState(2).randn(B, H, W, D, 1).astype(np.float16)).astype(jnp.bfloat16)

    time_fn("him baseline fwd", lambda c: him_baseline(c, wts), x)
    time_fn("him folded  fwd", lambda c: him_folded(c, wf), x)

    def g(body, w):
        def run(c):
            def f(xx):
                return jnp.mean(body(xx, w).astype(jnp.float32) ** 2)
            return jnp.mean(jax.grad(f)(c))
        return run

    time_fn("him baseline fwd+bwd", g(him_baseline, wts), x)
    time_fn("him folded  fwd+bwd", g(him_folded, wf), x)


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print("devices:", jax.devices(), flush=True)
    main()
