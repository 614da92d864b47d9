"""Async-BN full-step A/B on the real chip (round 4).

Question: exact train-mode BatchNorm makes normalize(y) wait on stats(y), so
XLA schedules (at least) two HBM read passes over every conv output. The
roofline (benchmarks/roofline.py) shows lom/him running AT the per-op
tiled-layout floor — the remaining lever is removing passes, not speeding
them up. AsyncBatchNorm (models/norm.py) normalizes through the one-step-
stale running stats, so the stats reduction and the normalize+act epilogue
are order-independent and can multi-output-fuse into one pass; the backward
additionally drops the batch-stat coupling terms.

Measures the production presets (fused OOL, bf16, no remat) with
bn_mode='batch' vs 'async' at bench scale. Timing per CLAUDE.md: host
transfer of the loss is the only real sync on the axon tunnel; median of N.
"""

import sys

sys.path.insert(0, "/root/repo")

import bench


def run(label, order, bn_mode, steps=8):
    try:
        sec = bench.measure_tpu_train_step(
            steps, "bfloat16", ool_mode="fused", augment_order=order,
            use_checkpointing=False, bn_mode=bn_mode,
        )
        print(f"RESULT {label}: {sec*1000:.1f} ms/step", flush=True)
    except Exception as e:
        print(f"RESULT {label}: FAILED {e!r}", flush=True)


def main():
    run("fast-int6 bn=batch", "fast-int6", "batch")
    run("fast-int6 bn=async", "fast-int6", "async")
    run("fast-int6 bn=slab ", "fast-int6", "slab")
    run("fast-bf16 bn=async", "fast-bf16", "async")


if __name__ == "__main__":
    main()
