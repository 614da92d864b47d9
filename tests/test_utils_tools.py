"""Morphology, visualization, metric writer, and preprocessing-tool tests."""

import json

import numpy as np
import torch

import jax.numpy as jnp

from deep_staple_tpu.ops.morphology import dilate_label_class
from deep_staple_tpu.utils.logging import MetricWriter, get_global_idx
from deep_staple_tpu.utils.visualization import visualize_seg


def test_dilate_matches_torch_reference(rng):
    lbl = rng.randint(0, 3, size=(2, 8, 7, 6)).astype(np.int64)

    # reference formula (torch_utils.py:36-63)
    t = torch.from_numpy(lbl)
    onehot = torch.nn.functional.one_hot(t, 3)[..., 1]
    B, D, H, W = onehot.shape
    kernel = torch.ones(1, 1, 3, 3, 3).long()
    conv = torch.nn.functional.conv3d(onehot.view(B, 1, D, H, W), kernel, padding="same")
    dil = torch.clamp(conv.squeeze(1), 0, 1)
    want = t.clone()
    want[dil.bool()] = 1

    got = np.asarray(dilate_label_class(jnp.asarray(lbl), 2, 1, use_2d=False))
    np.testing.assert_array_equal(got, want.numpy())


def test_get_global_idx():
    assert get_global_idx(2, 250, 999) == 2250  # reference log_utils.py:5-7 example
    assert get_global_idx(0, 39, 40) == 39


def test_metric_writer_jsonl(tmp_path):
    p = tmp_path / "m.jsonl"
    w = MetricWriter(jsonl_path=str(p))
    w.log({"a": 1.5, "b": np.float32(2.0)}, step=3)
    w.close()
    rec = json.loads(p.read_text().strip())
    assert rec["a"] == 1.5 and rec["b"] == 2.0 and rec["_step"] == 3


def test_visualize_seg_grid(tmp_path, rng):
    img = rng.rand(3, 10, 12, 8).astype(np.float32)
    seg = (rng.rand(3, 10, 12, 8) > 0.7).astype(np.int32)
    out = visualize_seg(
        in_type="batch_3D", reduce_dim="W", img=img, seg=seg, ground_truth=seg,
        overlay_text=["a", "b", "c"], frame_elements=[True, False, False],
        file_path=tmp_path / "viz.png",
    )
    assert out.ndim == 3 and out.shape[-1] == 3
    assert (tmp_path / "viz.png").is_file()


def test_get_cmap_dict_matches_reference_formula():
    # Golden values of the reference's discretization (visualization.py:226-264):
    # gist_rainbow sampled at i/num_ids, scaled by 255, int-truncated, id 0 -> None.
    from deep_staple_tpu.utils.visualization import get_cmap_dict

    assert get_cmap_dict(1) == {0: None, 1: (255, 0, 40)}
    assert get_cmap_dict(3) == {
        0: None, 1: (255, 0, 40), 2: (91, 255, 0), 3: (0, 143, 255)}
    nz = get_cmap_dict(1, no_color_zero_id=False)
    assert nz[0] is not None and len(nz) == 2


def test_visualize_offcenter_label_slice_and_cmap(tmp_path):
    # Golden-image check: a label confined to the LAST W-slice must be picked
    # up by the reduce (the old middle-slice reduce rendered an empty tile)
    # and colored with the gist_rainbow class-1 color (255, 0, 40).
    img = np.zeros((6, 5, 4), np.float32)
    seg = np.zeros((6, 5, 4), np.int32)
    seg[2:4, 1:3, 3] = 1  # off-center: only at W=3
    out = visualize_seg(in_type="single_3D", reduce_dim="W", img=img, seg=seg,
                        alpha_seg=1.0)
    assert out.shape == (6, 5, 3)
    expected = np.zeros((6, 5, 3), np.uint8)
    expected[2:4, 1:3] = (255, 0, 40)
    np.testing.assert_array_equal(out, expected)
    # Explicit color maps override the derived one.
    out2 = visualize_seg(in_type="single_3D", reduce_dim="W", img=img, seg=seg,
                         alpha_seg=1.0, onehot_color_map={0: None, 1: (0, 255, 0)})
    assert tuple(out2[2, 1]) == (0, 255, 0)


def test_visualize_frame_uses_annotate_color(rng):
    img = rng.rand(2, 8, 9).astype(np.float32)
    out = visualize_seg(in_type="batch_2D", img=img,
                        frame_elements=[True, False], annotate_color=(10, 20, 30))
    assert tuple(out[0, 0]) == (10, 20, 30)
    assert tuple(out[0, 9]) != (10, 20, 30)  # second tile unframed


def test_spearman_ties_and_sign():
    from deep_staple_tpu.train.driver import spearman_corr

    assert spearman_corr([1, 2, 2, 3], [10, 20, 20, 35]) == 1.0
    assert spearman_corr([1, 2, 3, 4], [8, 6, 4, 2]) == -1.0


def test_visualize_single_2d(rng):
    img = rng.rand(12, 9)
    seg = (img > 0.8).astype(np.int32)
    out = visualize_seg(in_type="single_2D", img=img, seg=seg)
    assert out.shape == (12, 9, 3)


def test_build_levels_roundtrip(tmp_path, rng):
    from deep_staple_tpu.data.nifti import save_nifti, load_nifti
    from deep_staple_tpu.tools.build_levels import resample_to_spacing, pad_min_to, crop_box

    vol = rng.rand(20, 18, 16).astype(np.float32)
    res = resample_to_spacing(vol, (1.0, 1.0, 1.0), 0.5, is_label=False)
    assert res.shape == (40, 36, 32)
    lbl = (vol > 0.8).astype(np.int16)
    lres = resample_to_spacing(lbl, (1.0, 1.0, 1.0), 0.5, is_label=True)
    assert set(np.unique(lres)) <= {0, 1}

    padded = pad_min_to(vol, (24, 24, 24))
    assert padded.shape == (24, 24, 24)
    crop = crop_box(vol, (2, 2, 2), (8, 8, 8))
    np.testing.assert_array_equal(crop, vol[2:10, 2:10, 2:10])


def test_nnunet_export(tmp_path, rng):
    from deep_staple_tpu.tools.nnunet_export import export_consensus_to_nnunet

    lbl = (rng.rand(8, 8, 8) > 0.7).astype(np.int32)
    cd = {
        "001l": {
            "expert_label": lbl,
            "prediction": lbl,
            "dp_consensus": lbl,
            "staple_consensus": lbl,
            "dp_consensus_oracle_dice": np.ones((1, 2)),
            "staple_consensus_oracle_dice": np.ones((1, 2)),
        }
    }
    tasks = export_consensus_to_nnunet(cd, tmp_path, task_prefix=600, upsample=2.0)
    assert len(tasks) == 3
    meta = json.loads((tmp_path / tasks[0] / "dataset.json").read_text())
    assert meta["numTraining"] == 1
    from deep_staple_tpu.data.nifti import load_nifti

    out = load_nifti(tmp_path / tasks[0] / "labelsTr" / "crossmoda_001l.nii.gz")
    assert out.shape == (16, 16, 16)
