"""End-to-end slice on the synthetic fixture: data prep -> fused train steps
-> snapshot export -> consensus. This is the DP-recovery oracle the reference
validates with (disturbed/bad samples must sink to low DP values,
`main_deep_staple.py:320-333`)."""

import pickle

import numpy as np
import pytest

from deep_staple_tpu.core.config import TrainConfig, DataParamMode
from deep_staple_tpu.data.synthetic import generate_synthetic_crossmoda
from deep_staple_tpu.train.prepare import prepare_data
from deep_staple_tpu.train.driver import train_dl

# Full multi-epoch training loops: minutes each on this 1-core box.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def synthetic_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    generate_synthetic_crossmoda(
        root, num_cases=6, atlas_count=3, bad_atlases_per_case=1, size=(24, 24, 24), seed=0
    )
    config = TrainConfig(
        dataset="synthetic",
        reg_state="synthetic",
        dataset_directory=str(root),
        crop_3d_w_dim_range=None,
        epochs=3,
        batch_size=4,
        num_val_images=2,
        lr=0.01,
        lr_inst_param=0.1,
        use_checkpointing=False,
        ool_mode="strict",
        save_every=1000,
        output_dir=str(root / "out"),
        mdl_save_prefix=str(root / "models"),
        log_jsonl=False,
    )
    dataset, atlas_count = prepare_data(config)
    results = train_dl("e2e-test", config, dataset, atlas_count)
    return root, config, dataset, atlas_count, results


def test_dataset_structure(synthetic_run):
    root, config, dataset, atlas_count, _ = synthetic_run
    assert atlas_count == 3
    # 6 cases x 3 atlases = 18 instances
    assert len(dataset) == 18
    ids = dataset.get_3d_ids()
    assert all(":m" in _id for _id in ids)
    s = dataset[0]
    assert s["image"].shape == (24, 24, 24)
    assert set(np.unique(s["label"])) <= {0, 1}


def test_training_ran_and_logged(synthetic_run):
    _, _, _, _, results = synthetic_run
    res = results[0]
    hist = res["writer"].history
    losses = [r for r in hist if "losses/loss_fold0" in r]
    assert len(losses) == 3  # one per epoch
    assert np.isfinite(losses[-1]["losses/loss_fold0"])
    val = [r for r in hist if "scores/val_dice_mean_wo_bg_fold0" in r]
    assert len(val) == 3


def test_dp_ranks_bad_atlases_low(synthetic_run):
    root, config, dataset, atlas_count, results = synthetic_run
    res = results[0]
    dp = np.asarray(res["state"].dp_params)
    with open(root / "synthetic_reg.pkl", "rb") as f:
        art = pickle.load(f)

    ids = dataset.get_3d_ids()
    good_dps, bad_dps = [], []
    for i in res["train_idxs"]:
        _id = ids[int(i)]
        f_id_short = _id.split(":")[0]
        m_id = _id.split(":m")[1]
        # fixture f_ids are like '3l' (no zero padding)
        fid_fixture = f"{int(f_id_short[:3])}{f_id_short[3]}"
        is_good = art["registrations"][fid_fixture][m_id]["is_good"]
        (good_dps if is_good else bad_dps).append(dp[int(i)])

    assert len(bad_dps) >= 3 and len(good_dps) >= 6
    # Bad atlases must receive lower data parameters on average.
    assert np.mean(bad_dps) < np.mean(good_dps)


def test_snapshot_and_consensus(synthetic_run):
    root, config, dataset, atlas_count, results = synthetic_run
    res = results[0]
    assert res["snapshot_path"] is not None and res["snapshot_path"].is_file()

    from deep_staple_tpu.consensus import evaluate_consensus, extract_consensus_dices

    cdicts = evaluate_consensus(res["snapshot_path"], staple_max_iterations=50)
    dp_dices, staple_dices = extract_consensus_dices(cdicts)
    assert len(dp_dices) == 4  # 6 cases - 2 val fixed images
    assert np.isfinite(dp_dices).all()
    # Atlas stacks contain mostly good atlases; consensus must beat chance.
    assert dp_dices.mean() > 0.5
    assert staple_dices.mean() > 0.5
