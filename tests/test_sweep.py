"""Grid-sweep driver smoke on the synthetic fixture (reference sweep:
`main_deep_staple.py:1099-1181`)."""

import numpy as np
import pytest

from deep_staple_tpu.core.config import TrainConfig
from deep_staple_tpu import main as main_mod


def test_sweep_runs_all_grid_points(tmp_path, monkeypatch):
    from deep_staple_tpu.data.synthetic import generate_synthetic_crossmoda

    generate_synthetic_crossmoda(tmp_path, num_cases=3, atlas_count=2, size=(12, 12, 12), seed=0)
    config = TrainConfig(
        dataset="synthetic",
        reg_state="synthetic",
        dataset_directory=str(tmp_path),
        crop_3d_w_dim_range=None,
        epochs=1,
        batch_size=4,
        num_val_images=1,
        use_checkpointing=False,
        ool_mode="fused",
        save_every=1000,
        save_labels=False,
        output_dir=str(tmp_path / "out"),
        mdl_save_prefix=str(tmp_path / "models"),
        log_jsonl=False,
        do_sweep=True,
    )
    # shrink the grid to 2 points for the smoke test
    monkeypatch.setattr(main_mod, "SWEEP_PARAMETERS", {"use_risk_regularization": [False, True]})
    results = main_mod.sweep_run(config)
    assert len(results) == 2
    for res in results.values():
        hist = res[0]["writer"].history
        assert any("scores/val_dice_mean_wo_bg_fold0" in r for r in hist)
