"""Aggregate per-op floor for the PRODUCTION train step vs. measured device
time (VERDICT r4 #3).

For every conv in the model at the bench workload (b8, 192x192x75, bf16,
async BN) this computes the binding per-op floor:

    floor(conv) = max(HBM tiled-layout floor, MXU compute floor)
    floor(depthwise conv) = probe-anchored VPU empirical (see below)

HBM floor (async-BN production step — stats fold into the conv epilogue and
BN backward loses its batch-stat coupling reductions, models/norm.py):
  fwd   : read x, write y
  dgrad : read dy, write dx
  wgrad : read dy, read saved x
i.e. 3*(bytes_in + bytes_out) per conv on the (16,128)-tiled layout actually
stored (W padded to 16, C padded to 128 — what the chip really moves;
roofline.py::vox_padded). Residual adds pay read+read+write on the block
output, fwd and bwd.

Depthwise convs lower OFF the MXU to a VPU path and are issue-bound far above
their HBM floor; no analytic bound is honest there, so their floor is the
MEASURED probe value — fwd 15.6 ms + dgrad 10.6 ms + wgrad 12.4 ms at
8x96x96x38x144 (benchmarks/probe_dw.py, probe_gw.py; XLA grouped conv, the
fastest of every probed formulation incl. a hand Pallas stencil) — scaled by
padded element count (VPU work is per-element).

The remaining step stages (warp, transposes/copies, resize/optimizer/loss)
are taken at their profiler-measured values and listed as measured-not-
floored; together they are ~9% of the step. A floor/device ratio ABOVE 100%
means the measured step beats the aggregate floor model — the depthwise
probe anchor was measured with exact-BN epilogues, so it slightly
overestimates the dw stages under async BN.

Usage:  python benchmarks/floor_table.py [--measured-lom MS ...]
Import: step_floor() -> dict used by bench.py to emit floor/MFU fields.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from roofline import (  # noqa: E402  (same directory)
    AUG,
    BATCH,
    BF16,
    HBM_GBPS,
    MID,
    MXU_TFLOPS,
    OUT,
    STRIDE,
    halve,
    vox,
    vox_padded,
)

# Probe anchors (benchmarks/probe_dw.py / probe_gw.py, measured on v5e-1):
# the full depthwise stage fwd+dgrad+wgrad at 8 x 96x96x38 x 144ch, bf16.
DW_PROBE_MS = 15.6 + 10.6 + 12.4
DW_PROBE_ELEMS = None  # filled below


def _padded_elems(spatial, c):
    return vox_padded(spatial, c) * c


DW_PROBE_ELEMS = _padded_elems((96, 96, 38), 144)


def conv_floor_ms(s_in, cin, s_out, cout, k=1, depthwise=False):
    """max(HBM tiled floor, MXU floor) for one conv; VPU empirical for dw."""
    if depthwise:
        return DW_PROBE_MS * _padded_elems(s_out, cout) / DW_PROBE_ELEMS
    bytes_in = _padded_elems(s_in, cin) * BF16
    bytes_out = _padded_elems(s_out, cout) * BF16
    hbm_ms = 3 * (bytes_in + bytes_out) / 1e9 / HBM_GBPS * 1e3
    flops = 3 * 2 * vox(s_out) * cin * cout * (k**3)  # fwd+dgrad+wgrad
    mxu_ms = flops / (MXU_TFLOPS * 1e12) * 1e3
    return max(hbm_ms, mxu_ms)


def stage_floors():
    """Per-bucket floors matching profile_model.py's attribution buckets."""
    him = lom = 0.0
    spatial = AUG
    cin = 1
    for i in range(10):
        s_out = halve(spatial) if (i == 0 or STRIDE[i] == 2) else spatial
        mid, cout = MID[i], OUT[i]
        s_mid = s_out if (i == 0 or STRIDE[i] == 2) else spatial
        t = 0.0
        if i == 0:
            # full 3^3 stride-2 conv 1->32 (no dw in block 0's first op)
            t += conv_floor_ms(spatial, cin, s_out, mid, k=3)
        else:
            t += conv_floor_ms(spatial, cin, spatial, mid)  # expand 1x1
        dw_in = s_out if i == 0 else spatial
        t += conv_floor_ms(dw_in, mid, s_mid, mid, k=3, depthwise=True)
        t += conv_floor_ms(s_mid, mid, s_out, cout)  # project 1x1
        if cin == cout and STRIDE[i] == 1 and i != 0:
            # residual: read skip + read y + write out, fwd and bwd
            t += 2 * 3 * _padded_elems(s_out, cout) * BF16 / 1e9 / HBM_GBPS * 1e3
        if i < 2:
            him += t
        else:
            lom += t
        spatial, cin = s_out, cout

    aspp = 0.0
    for k in (1, 3, 3, 3, 3):  # 1x1 + four dilated 3^3 branches, 64 -> 128
        aspp += conv_floor_ms(spatial, cin, spatial, 128, k=k)
    aspp += conv_floor_ms(spatial, 5 * 128, spatial, 128)  # concat project

    # LR-ASPP head (models/lraspp3d.py::LRASPPHead3D): cbr 16->128 at the him
    # grid, scale branch (global pool + 1x1, negligible), gating mul (one
    # read+write pass over the 128ch him grid), resize of the gated features
    # to the lom grid, and the two classifiers.
    him_grid, lom_grid = (96, 96, 38), spatial
    head = conv_floor_ms(him_grid, 16, him_grid, 128)  # cbr
    head += 3 * 2 * _padded_elems(him_grid, 128) * BF16 / 1e9 / HBM_GBPS * 1e3  # gate mul + resize passes
    head += conv_floor_ms(lom_grid, 128, lom_grid, 2)  # low_classifier
    head += conv_floor_ms(lom_grid, 128, lom_grid, 2)  # high_classifier (resized feats)
    return {"him": him, "lom": lom, "aspp": aspp, "head": head}


def model_flops():
    """Total fwd+bwd FLOPs of the model's convs at the bench workload."""
    total = 0
    spatial = AUG
    cin = 1
    for i in range(10):
        s_out = halve(spatial) if (i == 0 or STRIDE[i] == 2) else spatial
        mid, cout = MID[i], OUT[i]
        s_mid = s_out if (i == 0 or STRIDE[i] == 2) else spatial
        if i == 0:
            total += 3 * 2 * vox(s_out) * cin * mid * 27
        else:
            total += 3 * 2 * vox(spatial) * cin * mid
        total += 3 * 2 * vox(s_mid) * mid * 27  # depthwise
        total += 3 * 2 * vox(s_out) * mid * cout
        spatial, cin = s_out, cout
    for k in (1, 3, 3, 3, 3):
        total += 3 * 2 * vox(spatial) * cin * 128 * (k**3)
    total += 3 * 2 * vox(spatial) * 5 * 128 * 128
    return total


# r5 profiler attribution of the production step (fast-sep + async BN,
# benchmarks/profile_model.py --step --fast --order fast-sep --bn async;
# 404.1 ms device total, PATH-anchored buckets — the r4 "aspp 49" bucket was
# really aspp+head, see _MODULE_PATTERNS note in profile_model.py).
MEASURED = {
    "him": 75.9,
    "lom": 246.8,
    "aspp": 21.6,
    "head": 22.0,
    "warp (sep passes + coarse inversion)": 8.9,
    "transpose/copy": 15.9,
    "resize/optimizer/loss/other": 13.1,
}


def step_floor():
    floors = stage_floors()
    unfloored = {k: v for k, v in MEASURED.items()
                 if k not in floors}
    floor_total = sum(floors.values()) + sum(unfloored.values())
    return {
        "floors_ms": floors,
        "measured_pass_through_ms": unfloored,
        "floor_total_ms": floor_total,
        "model_flops_fwd_bwd": model_flops(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device-ms", type=float, default=404.0,
                    help="measured device time of the production step")
    args = ap.parse_args()
    info = step_floor()
    floors = info["floors_ms"]
    print(f"Production-step per-op floor vs measured (b{BATCH} "
          f"{AUG[0]}x{AUG[1]}x{AUG[2]} bf16, async BN):")
    print(f"{'bucket':42s} {'floor ms':>9s} {'measured ms':>12s}")
    for k in ("him", "lom", "aspp", "head"):
        print(f"{k:42s} {floors[k]:9.1f} {MEASURED[k]:12.1f}")
    for k, v in info["measured_pass_through_ms"].items():
        print(f"{k:42s} {'(meas)':>9s} {v:12.1f}")
    tot_meas = sum(MEASURED.values())
    print(f"{'TOTAL':42s} {info['floor_total_ms']:9.1f} {tot_meas:15.1f}")
    print(f"step at {info['floor_total_ms']/args.device_ms*100:.0f}% of its "
          f"aggregate per-op floor ({args.device_ms:.0f} ms measured device)")
    fl = info["model_flops_fwd_bwd"]
    print(f"model conv FLOPs fwd+bwd: {fl/1e12:.2f} TFLOP -> "
          f"MFU {fl/(args.device_ms/1e3)/(MXU_TFLOPS*1e12)*100:.1f}% "
          f"(bandwidth/issue-bound workload: 1.2M params at 16-64 channels)")


if __name__ == "__main__":
    main()
