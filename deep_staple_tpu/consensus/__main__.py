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
    p.add_argument("--plot-dir", default=None,
                   help="also write the paper's boxplot + per-case atlas-weighting figures here")
    args = p.parse_args(argv)

    from ..core.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    cd = evaluate_consensus(
        args.snapshot, out_path=args.output,
        staple_max_iterations=args.staple_iters,
        use_native_staple=args.native,
    )
    extract_consensus_dices(cd)
    print(f"wrote {args.output} ({len(cd)} fixed images)")

    if args.plot_dir is not None:
        from .figures import save_all_figures

        save_all_figures(cd, args.plot_dir)
        print(f"figures -> {args.plot_dir}")


if __name__ == "__main__":
    main()
