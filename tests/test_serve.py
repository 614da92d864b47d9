"""Serving CLI: a trained checkpoint restores standalone and segments raw
NIfTI volumes end-to-end (preprocess -> jitted eval forward -> label maps on
the input voxel grid)."""

import numpy as np

from deep_staple_tpu.core.config import TrainConfig
from deep_staple_tpu.data.nifti import load_nifti, save_nifti
from deep_staple_tpu.data.synthetic import generate_synthetic_crossmoda
from deep_staple_tpu.train.driver import train_dl
from deep_staple_tpu.train.prepare import prepare_data


def test_serve_from_checkpoint(tmp_path):
    generate_synthetic_crossmoda(tmp_path / "ds", num_cases=3, atlas_count=2, size=(12, 12, 12))
    cfg = TrainConfig(
        epochs=1,
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
    dataset, ac = prepare_data(cfg)
    train_dl("serve-test", cfg, dataset, ac)
    ckpt = tmp_path / "models" / "serve-test_fold0_epx0"
    assert (ckpt / "state.msgpack").is_file() and (ckpt / "config.json").is_file()

    # Two raw input volumes at a DIFFERENT grid than the model size: serving
    # must resample in and map predictions back out to this grid.
    rng = np.random.RandomState(7)
    inputs = []
    for i in range(2):
        vol = rng.randn(15, 14, 13).astype(np.float32)
        p = tmp_path / f"case{i}.nii.gz"
        save_nifti(p, vol, affine=np.diag([1.0, 2.0, 3.0, 1.0]))
        inputs.append(str(p))

    from deep_staple_tpu.serve import main as serve_main

    out_dir = tmp_path / "served"
    serve_main([
        "--checkpoint", str(ckpt), "--inputs", *inputs,
        "--output-dir", str(out_dir), "--batch-size", "2",
        "--size", "12", "12", "12", "--eval-scale", "1.0",
    ])

    for i in range(2):
        seg = load_nifti(out_dir / f"case{i}_seg.nii.gz")
        data = seg.get_fdata()
        assert data.shape == (15, 14, 13)  # back on the input grid
        assert set(np.unique(data)).issubset({0.0, 1.0})
        # source affine preserved
        np.testing.assert_allclose(np.diag(seg.affine), [1.0, 2.0, 3.0, 1.0])

    # Multi-chip serving: the same checkpoint served over a data=8 mesh
    # (virtual devices) must produce byte-identical label maps.
    out_dir_mesh = tmp_path / "served_mesh"
    serve_main([
        "--checkpoint", str(ckpt), "--inputs", *inputs,
        "--output-dir", str(out_dir_mesh), "--batch-size", "8",
        "--size", "12", "12", "12", "--eval-scale", "1.0",
        "--mesh-data", "8",
    ])
    for i in range(2):
        a = load_nifti(out_dir / f"case{i}_seg.nii.gz").get_fdata()
        b = load_nifti(out_dir_mesh / f"case{i}_seg.nii.gz").get_fdata()
        np.testing.assert_array_equal(a, b)

    # Whole-volume serving: a 2D (data=2, space=2) mesh — batch rows over
    # ('data',), each volume's H axis over ('space',) with GSPMD halo
    # exchanges — must also be byte-identical.
    out_dir_sp = tmp_path / "served_space"
    serve_main([
        "--checkpoint", str(ckpt), "--inputs", *inputs,
        "--output-dir", str(out_dir_sp), "--batch-size", "2",
        "--size", "12", "12", "12", "--eval-scale", "1.0",
        "--mesh-data", "2", "--mesh-space", "2",
    ])
    for i in range(2):
        a = load_nifti(out_dir / f"case{i}_seg.nii.gz").get_fdata()
        b = load_nifti(out_dir_sp / f"case{i}_seg.nii.gz").get_fdata()
        np.testing.assert_array_equal(a, b)

    # eval output space: volume stays on the model/eval grid and the affine
    # is rescaled so physical geometry is preserved
    out_dir2 = tmp_path / "served_eval"
    serve_main([
        "--checkpoint", str(ckpt), "--inputs", inputs[0],
        "--output-dir", str(out_dir2), "--batch-size", "1",
        "--size", "12", "12", "12", "--eval-scale", "1.0",
        "--output-space", "eval",
    ])
    seg = load_nifti(out_dir2 / "case0_seg.nii.gz")
    assert seg.get_fdata().shape == (12, 12, 12)
    np.testing.assert_allclose(
        np.diag(seg.affine)[:3], [1.0 * 15 / 12, 2.0 * 14 / 12, 3.0 * 13 / 12]
    )


def test_load_serving_state_from_orbax_checkpoint(tmp_path):
    """serve.load_serving_state bootstraps from an Orbax-backend checkpoint:
    the DP length is recovered template-free from the orbax tree (serve.py),
    then the full state restores through the auto-detecting path."""
    import jax.numpy as jnp

    from deep_staple_tpu.models import MobileNetLRASPP3D
    from deep_staple_tpu.serve import load_serving_state
    from deep_staple_tpu.train.checkpoint import save_checkpoint
    from deep_staple_tpu.train.state import create_state

    size = (12, 12, 12)
    model = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False)
    state, _ = create_state(model, (1, *size, 1), dataset_len=7)
    state = state.replace(dp_params=jnp.arange(7, dtype=jnp.float32))
    cfg = TrainConfig(crop_3d_w_dim_range=None, use_checkpointing=False)
    p = tmp_path / "ckpt"
    save_checkpoint(p, state, cfg, backend="orbax")

    _, _, restored, num_classes = load_serving_state(p, size=size)
    assert num_classes == 2
    np.testing.assert_array_equal(
        np.asarray(restored.dp_params), np.arange(7, dtype=np.float32)
    )
