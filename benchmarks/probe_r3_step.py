"""Round-3 full-step A/B on the real chip.

Variants (all fused OOL, bf16 compute, no remat — the production preset):
  1. fast-bf16, pointwise matmul ON  (working tree)
  2. fast-bf16, pointwise matmul OFF (r2 baseline config: 782 ms)
  3. fast-int8, pointwise matmul ON  (int8 quad-packed warp, unmeasured)
plus the reference-order int8 warp under strict OOL.

Timing per CLAUDE.md: host transfer of the loss is the only real sync on the
axon tunnel; median of N steps.
"""

import sys

sys.path.insert(0, "/root/repo")

import bench
from deep_staple_tpu.models import lraspp3d


def run(label, order, ool="fused", pointwise=True, steps=6):
    # Module-level toggle, consulted at trace time. (The original class-attr
    # assignment ConvBN.pointwise_matmul = x was a silent no-op — dataclass
    # __init__ defaults freeze at class creation — so the first A/B measured
    # the same config twice: 859.1 vs 857.6 ms.)
    lraspp3d.POINTWISE_MATMUL_DEFAULT = pointwise
    try:
        sec = bench.measure_tpu_train_step(
            steps, "bfloat16", ool_mode=ool, augment_order=order,
            use_checkpointing=False,
        )
        print(f"RESULT {label}: {sec*1000:.1f} ms/step", flush=True)
    except Exception as e:
        print(f"RESULT {label}: FAILED {e!r}", flush=True)


def main():
    run("fast-int8 pw-conv   ", "fast-int8", pointwise=False)
    run("fast-int8 pw-matmul ", "fast-int8", pointwise=True)
    run("fast-bf16 pw-conv   ", "fast-bf16", pointwise=False)
    run("fast-bf16 pw-matmul ", "fast-bf16", pointwise=True)


if __name__ == "__main__":
    main()
