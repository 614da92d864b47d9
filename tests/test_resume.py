"""Checkpoint/resume integration: a run resumed via checkpoint_name/epx must
continue from the saved state (reference resume path,
`main_deep_staple.py:122-125,608-617`)."""

import numpy as np

from deep_staple_tpu.core.config import TrainConfig
from deep_staple_tpu.data.synthetic import generate_synthetic_crossmoda
from deep_staple_tpu.train.driver import train_dl
from deep_staple_tpu.train.prepare import prepare_data


def test_resume_from_checkpoint(tmp_path):
    generate_synthetic_crossmoda(tmp_path / "ds", num_cases=3, atlas_count=2, size=(10, 10, 10))
    base = dict(
        dataset="synthetic",
        reg_state="synthetic",
        dataset_directory=str(tmp_path / "ds"),
        crop_3d_w_dim_range=None,
        batch_size=4,
        num_val_images=1,
        use_checkpointing=False,
        ool_mode="fused",
        save_every=1000,
        save_labels=False,
        output_dir=str(tmp_path / "out"),
        mdl_save_prefix=str(tmp_path / "models"),
        log_jsonl=False,
    )
    cfg1 = TrainConfig(epochs=2, **base)
    dataset, ac = prepare_data(cfg1)
    res1 = train_dl("resume-test", cfg1, dataset, ac)
    dp_after_2 = np.asarray(res1[0]["state"].dp_params)
    # final checkpoint written at epx1
    assert (tmp_path / "models" / "resume-test_fold0_epx1" / "state.msgpack").is_file()

    # resume at epoch 1 and train one more epoch
    cfg2 = TrainConfig(epochs=2, checkpoint_name="resume-test", checkpoint_epx=1, **base)
    dataset2, ac2 = prepare_data(cfg2)
    res2 = train_dl("resume-test-b", cfg2, dataset2, ac2)
    state2 = res2[0]["state"]
    # resumed run starts from the saved epx1 state: step counter continued
    assert int(state2.step) > 0
    dp_resumed = np.asarray(state2.dp_params)
    # DP params must have evolved from (not reset to) the restored state
    assert not np.allclose(dp_resumed, 0.0)
    assert not np.allclose(dp_resumed, dp_after_2)


def test_auto_resume_continues_after_newest_checkpoint(tmp_path):
    """--auto-resume: re-running the same command after an interruption
    restores the newest checkpoint and continues AFTER it; re-running a
    completed run is a no-op re-export (driver.py auto_resume block)."""
    generate_synthetic_crossmoda(tmp_path / "ds", num_cases=3, atlas_count=2, size=(10, 10, 10))
    base = dict(
        dataset="synthetic",
        reg_state="synthetic",
        dataset_directory=str(tmp_path / "ds"),
        crop_3d_w_dim_range=None,
        batch_size=4,
        num_val_images=1,
        use_checkpointing=False,
        ool_mode="fused",
        save_every=1,          # checkpoint at the end of every epoch
        save_labels=False,
        output_dir=str(tmp_path / "out"),
        mdl_save_prefix=str(tmp_path / "models"),
        log_jsonl=False,
        auto_resume=True,
    )
    # "interrupted" run: reaches epoch 1 (checkpoints at epx0 and epx1)
    cfg1 = TrainConfig(epochs=2, **base)
    dataset, ac = prepare_data(cfg1)
    res1 = train_dl("autoresume", cfg1, dataset, ac)
    step_after_2 = int(res1[0]["state"].step)
    assert (tmp_path / "models" / "autoresume_fold0_epx1" / "state.msgpack").is_file()

    # same command with the full epoch budget: must continue at epoch 2
    cfg2 = TrainConfig(epochs=4, **base)
    dataset2, ac2 = prepare_data(cfg2)
    res2 = train_dl("autoresume", cfg2, dataset2, ac2)
    step_after_4 = int(res2[0]["state"].step)
    assert step_after_4 == 2 * step_after_2  # exactly 2 more epochs of steps
    assert (tmp_path / "models" / "autoresume_fold0_epx3" / "state.msgpack").is_file()

    # completed run: auto-resume is a no-op re-export, state unchanged
    cfg3 = TrainConfig(epochs=4, **base)
    dataset3, ac3 = prepare_data(cfg3)
    res3 = train_dl("autoresume", cfg3, dataset3, ac3)
    assert int(res3[0]["state"].step) == step_after_4
    np.testing.assert_array_equal(
        np.asarray(res3[0]["state"].dp_params), np.asarray(res2[0]["state"].dp_params)
    )
