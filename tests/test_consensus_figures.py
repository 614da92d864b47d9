"""Consensus paper figures (consensus.ipynb cells 9 + 12-14 counterparts)."""

import numpy as np

from deep_staple_tpu.consensus.evaluate import evaluate_consensus
from deep_staple_tpu.consensus.figures import (
    consensus_dice_arrays,
    save_atlas_weighting_figure,
    save_consensus_boxplot,
)

from test_consensus_batched import _snapshot


def _evaluated(rng):
    return evaluate_consensus(_snapshot(rng), staple_max_iterations=40)


def test_boxplot_two_runs_with_baselines(rng, tmp_path):
    cd = _evaluated(rng)
    dp, st = consensus_dice_arrays(cd)
    assert st.shape == dp.shape and st.ndim == 1 and st.size == 3
    assert np.all((0.0 <= st) & (st <= 1.0)) and np.all((0.0 <= dp) & (dp <= 1.0))
    # same order as extract_consensus_dices — the two must be interchangeable
    from deep_staple_tpu.consensus.evaluate import extract_consensus_dices

    dp2, st2 = extract_consensus_dices(cd)
    assert np.allclose(dp, dp2) and np.allclose(st, st2)

    out = save_consensus_boxplot(
        {"deeds": cd, "convex_adam": (dp * 0.95, st * 0.9)},
        tmp_path / "boxplot.png",
        baselines={"deeds": [28.9, 48.0, 56.9], "convex_adam": [20.8, 49.5, 60.0]},
        oracle={"deeds": 84.4, "convex_adam": 83.8},
        title="consensus comparison",
    )
    assert out.exists() and out.stat().st_size > 2000


def test_boxplot_single_run_no_baselines(rng, tmp_path):
    out = save_consensus_boxplot({"run": _evaluated(rng)}, tmp_path / "single.png")
    assert out.exists() and out.stat().st_size > 2000


def test_atlas_weighting_figure(rng, tmp_path):
    cd = _evaluated(rng)
    f_id = next(iter(cd))
    out = save_atlas_weighting_figure(cd, f_id, tmp_path / "weight.png")
    assert out.exists() and out.stat().st_size > 2000
    # pickled round-trip path input also works
    import pickle

    p = tmp_path / "cd.pkl"
    p.write_bytes(pickle.dumps(cd))
    out2 = save_atlas_weighting_figure(p, f_id, tmp_path / "weight2.png", z_slice=3)
    assert out2.exists()
