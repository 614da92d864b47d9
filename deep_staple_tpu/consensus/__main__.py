"""Consensus stage CLI (the reference's consensus.ipynb as a command).

    python -m deep_staple_tpu.consensus --snapshot <train_label_snapshot.npz> \
        --output data/consensus/consensus_dict_mycase.pkl [--staple-iters 200] [--native]
"""

from __future__ import annotations

import argparse

from .evaluate import evaluate_consensus, extract_consensus_dices


def main(argv=None):
    p = argparse.ArgumentParser(description="DP + STAPLE consensus over a training snapshot")
    p.add_argument("--snapshot", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--staple-iters", type=int, default=200)
    p.add_argument("--native", action="store_true", help="use the C++ STAPLE instead of JAX")
    args = p.parse_args(argv)

    cd = evaluate_consensus(
        args.snapshot, out_path=args.output,
        staple_max_iterations=args.staple_iters,
        use_native_staple=args.native,
    )
    extract_consensus_dices(cd)
    print(f"wrote {args.output} ({len(cd)} fixed images)")


if __name__ == "__main__":
    main()
