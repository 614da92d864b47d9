"""Separable-warp full-step A/B on the real chip (round 4).

Question: the fused int6 warp's 2 arbitrary-index gathers run on the scalar
unit at ~122M idx/s (~110ms of the 558ms async-BN step). The separable
3-pass warp (ops/sep_warp.py) replaces them with Mosaic lane gathers at
~2.3G elem/s (benchmarks/probe_sep_warp.py). This probe:
  1. asserts the Pallas pass impl == the XLA twin impl on-chip (small scale),
  2. measures the production step under augment_order 'fast-int6' vs
     'fast-sep' (both with async BN, the round-4 preset).

Timing per CLAUDE.md: host transfer of the loss is the only real sync on the
axon tunnel.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def check_impl_equivalence():
    import jax
    import jax.numpy as jnp
    from deep_staple_tpu.ops.augment import AugmentParams, make_augment_parts
    from deep_staple_tpu.ops.sep_warp import sep_warp_apply, sep_warp_fields

    B, D, H, W = 2, 32, 32, 24
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, D, H, W).astype(np.float32))
    lbl = jnp.asarray((rng.rand(B, D, H, W) > 0.9).astype(np.int32))
    mod = jnp.asarray((rng.rand(B, D, H, W) > 0.9).astype(np.int32))
    eff_theta, ctl = make_augment_parts(jax.random.PRNGKey(1), B, (D, H, W), AugmentParams())
    f = sep_warp_fields(eff_theta, ctl, (D, H, W))
    xi, xl, xm = (np.asarray(a) for a in sep_warp_apply(img, lbl, mod, f, impl="xla"))
    pi, pl, pm = (np.asarray(a) for a in sep_warp_apply(img, lbl, mod, f, impl="pallas"))
    lbl_ok = (xl == pl).all() and (xm == pm).all()
    img_err = np.abs(xi - pi).max()
    print(f"pallas==xla: labels {bool(lbl_ok)}, img maxerr {img_err:.2e}", flush=True)
    assert lbl_ok and img_err < 1e-4


def run(label, order, steps=8):
    import bench

    try:
        sec = bench.measure_tpu_train_step(
            steps, "bfloat16", ool_mode="fused", augment_order=order,
            use_checkpointing=False, bn_mode="async",
        )
        print(f"RESULT {label}: {sec*1000:.1f} ms/step", flush=True)
    except Exception as e:
        print(f"RESULT {label}: FAILED {e!r}", flush=True)


def main():
    check_impl_equivalence()
    run("fast-int6 + asyncBN", "fast-int6")
    run("fast-sep  + asyncBN", "fast-sep")
    run("fast-sep  + asyncBN (rerun)", "fast-sep")


if __name__ == "__main__":
    main()
