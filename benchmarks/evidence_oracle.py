"""DP-recovery oracle stats for an evidence run on the synthetic fixture.

Reads a `train_label_snapshot.npz` (train/snapshot.py) plus the fixture's
`synthetic_reg.pkl` hidden `is_good` flags (data/synthetic.py) and reports
the paper's core effect as numbers (used by EVIDENCE.md):

  * mean data parameter of good vs corrupted atlases,
  * P(DP_good > DP_bad) — the rank AUC over all good x bad pairs,
  * how many corrupted atlases land in the bottom-K DP ranks.

The reference validates DP with exactly this kind of known-corruption
oracle (`main_deep_staple.py:320-333,564-587`).

Usage:
  python benchmarks/evidence_oracle.py SNAPSHOT.npz FIXTURE_DIR [--bottom-k K]
"""

import argparse
import pickle
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def oracle_stats(snapshot_path, fixture_dir, bottom_k=None):
    from deep_staple_tpu.data.snapshot_io import load_snapshot

    snap = load_snapshot(snapshot_path)
    with open(Path(fixture_dir) / "synthetic_reg.pkl", "rb") as f:
        art = pickle.load(f)
    regs = art["registrations"] if "registrations" in art else art

    dps, goods = [], []
    for _id, dp in zip(snap["d_ids"], snap["data_parameters"]):
        # snapshot ids are zero-padded '003l:m101l'; fixture keys are '3l'
        m = re.match(r"^(\d+)([lr]):m(.+)$", str(_id))
        if not m:
            continue
        f_id = f"{int(m.group(1))}{m.group(2)}"
        m_id = m.group(3)
        if f_id not in regs or m_id not in regs[f_id]:
            continue
        dps.append(float(dp))
        goods.append(bool(regs[f_id][m_id]["is_good"]))
    dps, goods = np.asarray(dps), np.asarray(goods)
    if not len(dps) or goods.all() or not goods.any():
        raise SystemExit("snapshot/fixture mismatch: no (good, bad) pairs found")

    good_dp, bad_dp = dps[goods], dps[~goods]
    auc = float(np.mean(good_dp[:, None] > bad_dp[None, :]))
    k = bottom_k or len(bad_dp)
    bottom = set(np.argsort(dps)[:k].tolist())
    bad_in_bottom = sum(1 for i in np.nonzero(~goods)[0] if int(i) in bottom)
    return {
        "n": int(len(dps)),
        "n_bad": int(len(bad_dp)),
        "mean_dp_good": float(good_dp.mean()),
        "mean_dp_bad": float(bad_dp.mean()),
        "rank_auc": auc,
        "bottom_k": int(k),
        "bad_in_bottom_k": int(bad_in_bottom),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("snapshot")
    ap.add_argument("fixture_dir")
    ap.add_argument("--bottom-k", type=int, default=None,
                    help="rank-tail size (default: number of corrupted atlases)")
    a = ap.parse_args()
    s = oracle_stats(a.snapshot, a.fixture_dir, a.bottom_k)
    print(f"instances: {s['n']} ({s['n_bad']} corrupted)")
    print(f"mean DP good/bad: {s['mean_dp_good']:+.3f} / {s['mean_dp_bad']:+.3f}")
    print(f"rank AUC P(DP_good > DP_bad): {s['rank_auc']:.3f}")
    print(f"corrupted in bottom-{s['bottom_k']} DP ranks: {s['bad_in_bottom_k']}/{s['n_bad']}")


if __name__ == "__main__":
    main()
