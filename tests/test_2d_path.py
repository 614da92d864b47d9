"""2D training path smoke: slice-view dataset, 2D model training step, and
the stack/unstack validation path (reference `use_2d_normal_to`,
`main_deep_staple.py:86,386-394,532-551,897-910`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_staple_tpu.core.config import TrainConfig
from deep_staple_tpu.data.synthetic import generate_synthetic_crossmoda
from deep_staple_tpu.train.prepare import prepare_data
from deep_staple_tpu.train.driver import make_model, precompute_sample_metrics
from deep_staple_tpu.train.state import create_state
from deep_staple_tpu.train.step import make_train_step, make_eval_step


@pytest.fixture(scope="module")
def dataset_2d(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth2d")
    generate_synthetic_crossmoda(root, num_cases=3, atlas_count=2, size=(8, 16, 16), seed=0)
    config = TrainConfig(
        dataset="synthetic",
        reg_state="synthetic",
        dataset_directory=str(root),
        crop_3d_w_dim_range=None,
        use_2d_normal_to="D",
        crop_2d_slices_gt_num_threshold=0,
        use_checkpointing=False,
    )
    dataset, atlas_count = prepare_data(config)
    return config, dataset, atlas_count


def test_2d_slicing(dataset_2d):
    config, dataset, _ = dataset_2d
    assert dataset.use_2d()
    # 3 cases x 2 atlases x 8 D-slices
    assert len(dataset) == 6 * 8
    s = dataset[0]
    assert s["image"].shape == (16, 16)
    assert s["id"].endswith("D000")
    # id mapping helpers
    dicts = dataset.get_id_dicts()
    assert dicts[0]["3d_dataset_idx"] == 0
    assert dataset.get_3d_from_2d_identifiers(s["id"]) == s["id"][:-4]


def test_2d_train_and_eval_step(dataset_2d):
    config, dataset, _ = dataset_2d
    model, in_ch = make_model(config, 2)
    n = len(dataset)
    state, tx = create_state(model, (1, 32, 32, in_ch), n)
    cw = np.array([0.5, 1.5], np.float32)
    fw = np.full((n,), 5.0, np.float32)
    # 2D path pre-interpolates x2.0 (reference :261)
    step = make_train_step(model, tx, config, cw, fw, pre_interpolation_factor=2.0)

    dataset.train(use_modified=True)
    hb = dataset.sample_batch([0, 1, 2, 3])
    batch = {k: jnp.asarray(v) for k, v in hb.items()}
    state, metrics = step(state, batch, 0.01, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["dice"].shape == (4, 2)

    # eval gets a full 3D volume and scores in 3D after restacking
    eval_step = make_eval_step(model, config, 2)
    dataset.eval()
    s3d = dataset.get_3d_item(0)
    pred, b_dice = eval_step(
        state,
        {
            "image": jnp.asarray(s3d["image"][None].astype(np.float32)),
            "label": jnp.asarray(s3d["label"][None].astype(np.int32)),
        },
    )
    assert pred.shape == (1, 16, 32, 32)
    assert b_dice.shape == (1, 2)
