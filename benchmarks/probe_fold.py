"""Probe layout levers on a representative lom block: transpose + 2x2 fold.

roofline.py shows the model stages run at the (16,128)-tiled-layout HBM
floor, which pads the minor two dims (W, C) of every NDHWC tensor:
W=38 -> 48 (1.26x) and C -> multiples of 128 (up to 8x for 16ch). Two exact
rewrites attack the padding:

  * TRANSPOSE: order the spatial dims so a 96-derived extent sits minor
    ((B, 38, 96, 96, C) instead of (B, 96, 96, 38, C)) — kills the W pad,
    zero math change (conv kernels permute along).
  * FOLD (2x2 space-to-depth, channel-major): positions/4, channels x4 —
    fills the lane dim (32 -> 128 exact on block 5); depthwise becomes a
    grouped 4->4 conv, 1x1s become phase-block-diagonal dense matmuls
    (probe_him.py weight folds).

Block 5 (32 -> 192 -> 32, residual, @ 8x96x96x38) is the largest lom block.
All variants are verified element-wise on CPU (--verify-only) before timing.

ON-CHIP VERDICT (v5e-1, 2026-08-19): REJECTED.
  * base fwd 26.91 ms/iter, transposed fwd 27.23 ms/iter — the transpose is
    a no-op on the chip. XLA canonicalizes convolution operand layouts
    internally, so reordering the *logical* spatial dims does not change the
    physical (16,128) tiling the convs run on; the 1.26x padded-bytes win
    the roofline predicts never materializes at the XLA level.
  * folded fwd: compile OOM — the grouped-conv lowering of the folded
    depthwise materializes a bf16[8,48,48,38,192,4] copy (17.2 GB > 16 GB
    HBM). XLA's feature_group_count path expands fold-phase interactions
    into a dense per-phase temp instead of keeping them grouped.
Conclusion: tiled-layout padding cannot be attacked from the logical level;
only a hand Pallas kernel (which owns its physical layout) can — see
ops/fused_block_pallas.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_fold.py
CPU:   PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python -u benchmarks/probe_fold.py --verify-only
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from benchmarks.probe_him import (
    bn_act,
    conv,
    d2s,
    fold_w_dw_s1,
    fold_w_pointwise,
    s2d,
)

B = 8
SP = (96, 96, 38)
CIN, MID, COUT = 32, 192, 32
ITERS = 10
P1 = [(1, 1)] * 3


def make_weights():
    rng = np.random.RandomState(0)
    mk = lambda *sh: (rng.randn(*sh) * 0.12).astype(np.float32)
    return {
        "exp": mk(1, 1, 1, CIN, MID),
        "dw": mk(3, 3, 3, 1, MID),
        "proj": mk(1, 1, 1, MID, COUT),
    }


def block_base(x, w):
    y = bn_act(conv(x, jnp.asarray(w["exp"]), (1, 1, 1), "VALID"), False, True)
    y = bn_act(conv(y, jnp.asarray(w["dw"]), (1, 1, 1), P1, groups=MID), False, True)
    y = bn_act(conv(y, jnp.asarray(w["proj"]), (1, 1, 1), "VALID"), False, False)
    return y + x


# transpose: (B, 96, 96, 38, C) -> (B, 38, 96, 96, C). Kernel TAP axes must
# permute with the data axes (1x1x1 kernels are unaffected).
def t_in(x):
    return jnp.transpose(x, (0, 3, 1, 2, 4))


def t_out(y):
    return jnp.transpose(y, (0, 2, 3, 1, 4))


def t_kernel(w):
    return np.transpose(w, (2, 0, 1, 3, 4))


def transpose_weights(w):
    return {**w, "dw": t_kernel(w["dw"])}


def block_transposed(xt, wt):
    return block_base(xt, wt)  # same ops on the permuted layout/weights


def fold_weights(w):
    return {
        "exp": fold_w_pointwise(w["exp"]),
        "dw": fold_w_dw_s1(w["dw"], MID),
        "proj": fold_w_pointwise(w["proj"]),
    }


def block_folded(xf, wf):
    """xf: channel-major folded (B, 48, 48, 38, 4*CIN)."""
    y = bn_act(conv(xf, jnp.asarray(wf["exp"]), (1, 1, 1), "VALID"), True, True)
    y = bn_act(conv(y, jnp.asarray(wf["dw"]), (1, 1, 1), P1, groups=MID), True, True)
    y = bn_act(conv(y, jnp.asarray(wf["proj"]), (1, 1, 1), "VALID"), True, False)
    return y + xf


def s2d23(x):
    """Fold spatial dims 2,3 (the trailing 96x96 of a transposed tensor)."""
    b, s1, h, w_, c = x.shape
    x = x.reshape(b, s1, h // 2, 2, w_ // 2, 2, c)
    x = x.transpose(0, 1, 2, 4, 6, 3, 5)
    return x.reshape(b, s1, h // 2, w_ // 2, c * 4)


def d2s23(x):
    b, s1, h2, w2, c4 = x.shape
    x = x.reshape(b, s1, h2, w2, c4 // 4, 2, 2)
    x = x.transpose(0, 1, 2, 5, 3, 6, 4)
    return x.reshape(b, s1, h2 * 2, w2 * 2, c4 // 4)


def block_tf(xtf, wft):
    """transposed + folded: (B, 38, 48, 48, 4*CIN). The folded dw kernel's
    tap layout is (folded, folded, dense); transposed data needs
    (dense, folded, folded)."""
    return block_folded(xtf, wft)


def tf_weights(wf):
    return {**wf, "dw": t_kernel(wf["dw"])}


def verify():
    w = make_weights()
    wf = fold_weights(w)
    rng = np.random.RandomState(1)
    xs = jnp.asarray(rng.randn(2, 12, 12, 10, CIN).astype(np.float32))

    a = np.asarray(block_base(xs, w))

    bt = np.asarray(t_out(block_transposed(t_in(xs), transpose_weights(w))))
    np.testing.assert_allclose(a, bt, rtol=2e-4, atol=2e-4)
    print("transposed == base: OK", flush=True)

    cf = np.asarray(d2s(block_folded(s2d(xs), wf)))
    np.testing.assert_allclose(a, cf, rtol=3e-4, atol=3e-4)
    print("folded == base: OK", flush=True)

    dtf = np.asarray(t_out(d2s23(block_tf(s2d23(t_in(xs)), tf_weights(wf)))))
    np.testing.assert_allclose(a, dtf, rtol=3e-4, atol=3e-4)
    print("transposed+folded == base: OK", flush=True)


def time_fn(name, body, x):
    @jax.jit
    def fn(c):
        return jax.lax.fori_loop(
            0, ITERS, lambda i, c2: c2 * 0.999 + 0.001 * jnp.mean(body(c2)).astype(c2.dtype), x
        )

    out = fn(x)
    np.asarray(out.ravel()[:1])  # tiny sync (tunnel host link ~13 MB/s in r4)
    t0 = time.perf_counter()
    out = fn(x)
    np.asarray(out.ravel()[:1])
    dt = (time.perf_counter() - t0) * 1e3 / ITERS
    print(f"{name}: {dt:.2f} ms/iter", flush=True)
    return dt


def grad_of(block, w):
    def run(c):
        def f(xx):
            return jnp.mean(block(xx, w).astype(jnp.float32) ** 2)
        return jnp.mean(jax.grad(f)(c))
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify-only", action="store_true")
    args = ap.parse_args()
    if args.verify_only:
        verify()
        return

    w = make_weights()
    wf = fold_weights(w)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, *SP, CIN).astype(np.float32)).astype(jnp.bfloat16)
    xt = jnp.asarray(np.transpose(np.asarray(x), (0, 3, 1, 2, 4)))
    xf = s2d(x)
    xtf = s2d23(xt)
    print(f"shapes: base {x.shape} transposed {xt.shape} folded {xf.shape} t+f {xtf.shape}", flush=True)

    wt, wft = transpose_weights(w), tf_weights(wf)
    time_fn("block5 base        fwd", lambda c: block_base(c, w), x)
    time_fn("block5 transposed  fwd", lambda c: block_transposed(c, wt), xt)
    time_fn("block5 folded      fwd", lambda c: block_folded(c, wf), xf)
    time_fn("block5 transp+fold fwd", lambda c: block_tf(c, wft), xtf)

    time_fn("block5 base        fwd+bwd", grad_of(block_base, w), x)
    time_fn("block5 transposed  fwd+bwd", grad_of(block_transposed, wt), xt)
    time_fn("block5 folded      fwd+bwd", grad_of(block_folded, wf), xf)
    time_fn("block5 transp+fold fwd+bwd", grad_of(block_tf, wft), xtf)


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print("devices:", jax.devices(), flush=True)
    main()
