import numpy as np

from deep_staple_tpu.data.nifti import save_nifti
from deep_staple_tpu.data.nifti_sets import get_nifti_filepaths
from deep_staple_tpu.tools.nnunet_export import export_domain_gap


def test_get_nifti_filepaths(tmp_path, rng):
    (tmp_path / "sub").mkdir()
    save_nifti(tmp_path / "a_001.nii.gz", rng.rand(3, 3, 3).astype(np.float32))
    save_nifti(tmp_path / "sub" / "b_002.nii", rng.rand(3, 3, 3).astype(np.float32))
    (tmp_path / "c.txt").write_text("x")

    flat = get_nifti_filepaths(tmp_path)
    assert len(flat) == 1
    rec = get_nifti_filepaths(tmp_path, with_subdirs=True)
    assert len(rec) == 2
    only = get_nifti_filepaths(tmp_path, id_subset=["001"], with_subdirs=True)
    assert len(only) == 1 and "a_001" in only[0]


def test_export_domain_gap(tmp_path, rng):
    from deep_staple_tpu.data.synthetic import generate_synthetic_crossmoda
    from deep_staple_tpu.core.config import TrainConfig
    from deep_staple_tpu.train.prepare import prepare_data

    generate_synthetic_crossmoda(tmp_path / "ds", num_cases=2, atlas_count=2, size=(8, 8, 8))
    config = TrainConfig(
        dataset="synthetic", reg_state="synthetic",
        dataset_directory=str(tmp_path / "ds"), crop_3d_w_dim_range=None,
    )
    dataset, _ = prepare_data(config)
    task = export_domain_gap(dataset, tmp_path / "nn", task_id=571)
    assert (tmp_path / "nn" / task / "dataset.json").is_file()
    imgs = list((tmp_path / "nn" / task / "imagesTr").glob("*.nii.gz"))
    assert len(imgs) == len(dataset)
