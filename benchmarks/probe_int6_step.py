"""Full-step A/B on the real chip: fast-int8 (3 gathers) vs fast-int6
(2 fused gathers, ops/augment.py::_warp_fused_int6pack).

Timing per CLAUDE.md: host transfer of the loss is the only real sync on the
axon tunnel; median of N steps.
"""

import sys

sys.path.insert(0, "/root/repo")

import bench


def run(label, order, ool="fused", steps=8):
    try:
        sec = bench.measure_tpu_train_step(
            steps, "bfloat16", ool_mode=ool, augment_order=order,
            use_checkpointing=False,
        )
        print(f"RESULT {label}: {sec*1000:.1f} ms/step", flush=True)
    except Exception as e:
        print(f"RESULT {label}: FAILED {e!r}", flush=True)


def main():
    run("fast-int8", "fast-int8")
    run("fast-int6", "fast-int6")
    run("fast-int8 again", "fast-int8")
    run("fast-int6 again", "fast-int6")


if __name__ == "__main__":
    main()
