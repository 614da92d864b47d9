"""Analytic HBM roofline for the production train step's model stages.

VERDICT r3 #5: anchor the perf claim to hardware limits, not the torch-CPU
ratio. For each backbone/ASPP stage at the bench workload (b8, 192x192x75
bf16) this prints:

  * logical HBM traffic under the PER-OP model (what a conv-by-conv XLA
    schedule must move: conv reads/writes + BN stats pass + one fused
    normalize+act pass per ConvBN, fwd and bwd),
  * traffic under the PERFECT-FUSION model (read each block's input once,
    write its output once; backward reads the saved input + incoming grad,
    writes outgoing grad + weight grads) — the floor any fused block kernel
    is chasing,
  * the resulting ms floors at v5e HBM bandwidth (~819 GB/s), beside the
    measured per-stage profiler attribution when supplied.

MXU/VPU compute floors are also printed per stage; the binding constraint
per stage is max(HBM, compute). The depthwise convs' compute runs on the
VPU path (XLA lowers group-size-1 convs off the MXU; measured
15.6 ms fwd at 8x96x96x38x144 vs its 2.7 ms HBM floor — probe_dw.py), so
dw stages carry an empirical 5.8x-of-HBM-floor note rather than a clean
analytic bound.

Usage: python benchmarks/roofline.py  (pure analytics, no device needed)
"""

from __future__ import annotations

BATCH = 8
AUG = (192, 192, 75)
BF16 = 2
HBM_GBPS = 819.0  # v5e
MXU_TFLOPS = 197.0  # v5e bf16

MID = (32, 96, 96, 144, 144, 192, 192, 192, 384, 384)
OUT = (16, 16, 24, 24, 32, 32, 32, 64, 64, 64)
STRIDE = (1, 1, 1, 1, 1, 1, 2, 1, 1, 1)


def vox(spatial):
    d, h, w = spatial
    return BATCH * d * h * w


def vox_padded(spatial, c):
    """Tiled-layout voxel count: TPU stores arrays (16, 128)-tiled in the
    minor two dims for bf16 — (W, C) for NDHWC — so W pads to a multiple of
    16 and C to a multiple of 128. This is what actually moves over HBM and
    why sub-128 channel counts inflate every op that touches them
    (e.g. 16 ch -> 8x lane waste, W=38 -> 48)."""
    d, h, w = spatial
    wp = -(-w // 16) * 16
    cp = -(-c // 128) * 128
    return BATCH * d * h * wp * cp / max(c, 1)


def halve(spatial):
    return tuple((s + 1) // 2 for s in spatial)


def tensor_bytes(spatial, c, padded: bool):
    n = vox_padded(spatial, c) if padded else vox(spatial)
    return n * c * BF16


def tensor_bytes_folded(spatial, c, fold: int = 4):
    """Tiled-layout bytes after 2x2 space-to-depth on the two MAJOR spatial
    dims (positions / fold, channels x fold) — probe_him.py's exact rewrite.
    Logical bytes are fold-invariant; only the (16,128) tile padding drops."""
    d, h, w = spatial
    side = {1: 1, 4: 2, 16: 4}[fold]
    d, h, c = d // side, h // side, c * fold
    wp = -(-w // 16) * 16
    cp = -(-c // 128) * 128
    return BATCH * d * h * wp * cp * BF16


def convbn_traffic(s_in, cin, s_out, cout, padded, fold: int = 1):
    """Per-op-model fwd+bwd HBM bytes for conv + BN(train) + act.

    fwd: conv reads in, writes out; BN stats read out; normalize+act read
    out, write out. bwd: act/BN bwd reads grad+saved (2 reads, 1 write);
    dgrad reads grad writes din; wgrad reads grad + saved input.
    All bf16; weights negligible at these channel counts.
    """
    if fold > 1:
        r_in = tensor_bytes_folded(s_in, cin, fold)
        w_out = tensor_bytes_folded(s_out, cout, fold)
    else:
        r_in = tensor_bytes(s_in, cin, padded)
        w_out = tensor_bytes(s_out, cout, padded)
    fwd = r_in + w_out + w_out + (w_out + w_out)  # conv + stats + norm/act
    bwd = (
        (2 * w_out + w_out)  # act+BN backward (read g, read saved, write g')
        + (w_out + r_in)  # dgrad: read g', write dx
        + (w_out + r_in)  # wgrad: read g', read saved x
    )
    return fwd, bwd


def fused_block_traffic(s_in, cin, s_out, cout, padded: bool):
    """Perfect-fusion floor for one inverted-residual block.

    fwd: read x, write y (intermediates live in VMEM). bwd: read (x, dy),
    write dx; weight grads negligible."""
    r_in = tensor_bytes(s_in, cin, padded)
    w_out = tensor_bytes(s_out, cout, padded)
    return (r_in + w_out), (r_in + w_out + w_out + r_in)


def block_flops(n_out, cin, mid, cout, n_in=None, k_first=1):
    n_in = n_in or n_out
    expand = 2 * n_out * cin * mid * (k_first**3)
    dw = 2 * n_out * mid * 27
    proj = 2 * n_out * mid * cout
    return expand + dw + proj


def fmt_gb(b):
    return b / 1e9


def stage_rows():
    rows = []
    spatial = AUG
    cin = 1
    for i in range(10):
        s_out = halve(spatial) if (i == 0 or STRIDE[i] == 2) else spatial
        mid, cout = MID[i], OUT[i]
        s_mid = s_out if (i == 0 or STRIDE[i] == 2) else spatial
        perop = {}
        fused = {}
        for mode in ("logical", "padded", "folded"):
            padded = mode != "logical"
            fold = 4 if mode == "folded" else 1
            if i == 0:
                f1, b1 = convbn_traffic(spatial, cin, s_out, mid, padded, fold)
            else:
                f1, b1 = convbn_traffic(spatial, cin, spatial, mid, padded, fold)
            dw_in = s_out if i == 0 else spatial
            f2, b2 = convbn_traffic(dw_in, mid, s_mid, mid, padded, fold)
            f3, b3 = convbn_traffic(s_mid, mid, s_out, cout, padded, fold)
            res = (cin == cout and STRIDE[i] == 1 and i != 0)
            rb = (tensor_bytes_folded(s_out, cout, fold) if fold > 1
                  else tensor_bytes(s_out, cout, padded))
            resid = 2 * rb if res else 0
            perop[mode] = f1 + f2 + f3 + b1 + b2 + b3 + 2 * resid
            if mode != "folded":
                ff, fb = fused_block_traffic(spatial, cin, s_out, cout, padded)
                fused[padded] = ff + fb
        n_out = vox(s_out)
        flops = 3 * block_flops(n_out, cin, mid, cout, n_in=vox(spatial),
                                k_first=3 if i == 0 else 1)  # fwd+dgrad+wgrad
        rows.append(
            (f"block{i} ({'him' if i < 2 else 'lom'}) {cin}->{mid}->{cout}"
             f" @{s_out[0]}x{s_out[1]}x{s_out[2]}",
             perop["logical"], perop["padded"], perop["folded"],
             fused[False], flops)
        )
        spatial, cin = s_out, cout

    # ASPP at the lom output grid: 5 branches of 128ch + concat 640 -> 128
    n = vox(spatial)
    perop = {}
    for mode in ("logical", "padded", "folded"):
        padded = mode != "logical"
        fold = 4 if mode == "folded" else 1
        t = 0
        for _ in range(5):
            f, b = convbn_traffic(spatial, cin, spatial, 128, padded, fold)
            t += f + b
        f, b = convbn_traffic(spatial, 5 * 128, spatial, 128, padded, fold)
        perop[mode] = t + f + b
    aspp_flops = 3 * sum(2 * n * cin * 128 * (k**3) for k in (1, 3, 3, 3, 3))
    rows.append((f"aspp 64->5x128->128 @{spatial[0]}x{spatial[1]}x{spatial[2]}",
                 perop["logical"], perop["padded"], perop["folded"],
                 (tensor_bytes(spatial, cin, False) + tensor_bytes(spatial, 128, False)) * 3,
                 aspp_flops))
    return rows


def main():
    rows = stage_rows()
    print(f"HBM roofline @ {HBM_GBPS:.0f} GB/s, MXU {MXU_TFLOPS:.0f} TFLOP/s bf16 "
          f"(v5e), bench workload b{BATCH} {AUG[0]}x{AUG[1]}x{AUG[2]}, fwd+bwd")
    print(f"{'stage':46s} {'logical ms':>10s} {'padded ms':>10s} "
          f"{'folded ms':>10s} {'fused ms':>9s} {'MXU ms':>7s}")
    tot = [0.0, 0.0, 0.0, 0.0, 0.0]
    groups = {"him": [0.0, 0.0, 0.0], "lom": [0.0, 0.0, 0.0]}
    for name, perop_l, perop_p, perop_f, fused_l, flops in rows:
        lm = fmt_gb(perop_l) / HBM_GBPS * 1e3
        pm = fmt_gb(perop_p) / HBM_GBPS * 1e3
        om = fmt_gb(perop_f) / HBM_GBPS * 1e3
        fm = fmt_gb(fused_l) / HBM_GBPS * 1e3
        cm = flops / (MXU_TFLOPS * 1e12) * 1e3
        for k, v in enumerate((lm, pm, om, fm, cm)):
            tot[k] += v
        for g in groups:
            if f"({g})" in name:
                for k, v in enumerate((lm, pm, om)):
                    groups[g][k] += v
        print(f"{name:46s} {lm:10.2f} {pm:10.2f} {om:10.2f} {fm:9.2f} {cm:7.2f}")
    print(f"{'TOTAL (model fwd+bwd)':46s} {tot[0]:10.2f} {tot[1]:10.2f} "
          f"{tot[2]:10.2f} {tot[3]:9.2f} {tot[4]:7.2f}")
    for g, (lm, pm, om) in groups.items():
        print(f"{g}: logical per-op floor {lm:.1f} ms, tiled-layout {pm:.1f} ms, "
              f"2x2-folded tiled {om:.1f} ms")
    print()
    print("'logical' = per-op XLA schedule floor on logical bytes; 'padded'")
    print("= same schedule on the (16,128)-tiled layout actually stored (W")
    print("and C padded), the bytes the chip really moves; 'fused' = perfect")
    print("block fusion floor (read x / write y only, logical bytes). The")
    print("depthwise convs additionally pay a compute (VPU-lowering) cost")
    print("above these BW floors: measured 15.6 ms fwd at 8x96x96x38x144")
    print("vs a 2.7 ms padded-BW floor (probe_dw.py).")


if __name__ == "__main__":
    main()
