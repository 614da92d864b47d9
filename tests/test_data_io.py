"""NIfTI round-trip (Python + native C++ loader), snapshot I/O, numpy op mirrors."""

from pathlib import Path

import numpy as np
import pytest

from deep_staple_tpu.data.nifti import load_nifti, save_nifti
from deep_staple_tpu.data.native_io import try_native_load, _find_lib
from deep_staple_tpu.data.snapshot_io import save_snapshot, load_snapshot
from deep_staple_tpu.data.np_ops import resize_nd_np, pad_to_size_np


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
def test_nifti_roundtrip(tmp_path, rng, suffix, dtype):
    if np.issubdtype(dtype, np.floating):
        vol = rng.rand(7, 6, 5).astype(dtype)
    else:
        vol = rng.randint(0, 100, size=(7, 6, 5)).astype(dtype)
    p = tmp_path / f"vol{suffix}"
    save_nifti(p, vol)
    img = load_nifti(p)
    np.testing.assert_allclose(img.get_fdata(), vol.astype(np.float64))


def test_native_loader_matches_python(tmp_path, rng):
    if _find_lib() is None:
        pytest.skip("native lib not built")
    vol = rng.rand(9, 7, 5).astype(np.float32)
    p = tmp_path / "v.nii.gz"
    save_nifti(p, vol)
    got = try_native_load(p)
    np.testing.assert_allclose(got, vol.astype(np.float64), rtol=1e-6)


def test_nifti_matches_nibabel_semantics_via_torch_free_check(tmp_path, rng):
    # Fortran voxel order: element [i, j, k] must be at offset i + ni*j + ni*nj*k.
    vol = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    p = tmp_path / "v.nii"
    save_nifti(p, vol)
    raw = p.read_bytes()
    data = np.frombuffer(raw[352:], np.float32)
    assert data[0] == vol[0, 0, 0]
    assert data[1] == vol[1, 0, 0]  # first axis fastest


def test_snapshot_roundtrip(tmp_path, rng):
    n, shape = 3, (6, 5, 4)
    labels = (rng.rand(n, *shape) > 0.8).astype(np.int32)
    snap = {
        "data_parameters": rng.randn(n).astype(np.float32),
        "disturb_flags": np.array([True, False, True]),
        "d_ids": ["001l:m100l", "001l:m101l", "002l:m100l"],
        "dataset_idxs": np.arange(n, dtype=np.int32),
        "image_paths": ["a", "b", "c"],
        "label_paths": ["d", "e", "f"],
        "labels": labels,
        "modified_labels": labels,
        "train_predictions": labels[:, None],
    }
    p = tmp_path / "snap.npz"
    save_snapshot(p, snap)
    out = load_snapshot(p)
    np.testing.assert_allclose(out["data_parameters"], snap["data_parameters"])
    assert out["d_ids"] == snap["d_ids"]
    np.testing.assert_array_equal(out["labels"], labels)
    np.testing.assert_array_equal(out["train_predictions"], snap["train_predictions"])
    np.testing.assert_array_equal(out["disturb_flags"], snap["disturb_flags"])


def test_snapshot_pth_export_reference_format(tmp_path, rng):
    """The .pth export must be consumable by reference tooling: torch.load
    yields the reference save_dict types (`main_deep_staple.py:1013-1034`) —
    (N,1) f32 data_parameters, tuples for ids/flags/paths, stacked sparse
    label tensors — and load_snapshot round-trips it."""
    torch = pytest.importorskip("torch")
    from deep_staple_tpu.data.snapshot_io import save_snapshot_pth

    n, shape = 3, (6, 5, 4)
    labels = (rng.rand(n, *shape) > 0.8).astype(np.int32)
    snap = {
        "data_parameters": rng.randn(n).astype(np.float32),
        "disturb_flags": np.array([True, False, True]),
        "d_ids": ["001l:m100l", "001l:m101l", "002l:m100l"],
        "dataset_idxs": np.arange(n, dtype=np.int32),
        "image_paths": ["a", "b", "c"],
        "label_paths": ["d", "e", "f"],
        "labels": labels,
        "modified_labels": labels,
        "train_predictions": labels,
    }
    p = tmp_path / "train_label_snapshot.pth"
    save_snapshot_pth(p, snap)

    raw = torch.load(p)
    assert raw["data_parameters"].shape == (n, 1)
    assert raw["data_parameters"].dtype == torch.float32
    assert isinstance(raw["d_ids"], tuple) and raw["d_ids"][0] == "001l:m100l"
    assert isinstance(raw["disturb_flags"], tuple)
    assert raw["dataset_idxs"].dtype == torch.int64
    assert raw["labels"].is_sparse
    assert raw["train_predictions"].shape == (n, 1) + shape  # inference batch dim
    # The consensus notebook's access pattern (cell 6): index row, densify.
    i = raw["d_ids"].index("001l:m101l")
    np.testing.assert_array_equal(raw["labels"][i].to_dense().numpy(), labels[i])

    out = load_snapshot(p)
    np.testing.assert_allclose(out["data_parameters"].reshape(-1), snap["data_parameters"])
    np.testing.assert_array_equal(out["labels"], labels)


def test_consensus_dict_pth_reference_interop(tmp_path, rng):
    """Per-experiment consensus dicts persisted as `.pth` must load where the
    reference's postprocessing expects (`consensus.ipynb` cell 6:96-98 schema;
    consumed by cell 7 `extract_consensus_dices`, cell 13's atlas-weighting
    figure, and nnunet_prepare_dataparameter_consensus_data.py:34-41) — the
    same interop guarantee snapshots already have."""
    torch = pytest.importorskip("torch")
    from deep_staple_tpu.consensus import (
        evaluate_consensus,
        extract_consensus_dices,
        load_consensus_dicts_pth,
    )

    # 2 fixed images x 3 atlases (STAPLE needs >= 3 raters), tiny volumes.
    n_fixed, n_atlas, shape = 2, 3, (6, 5, 4)
    d_ids, labels, mods, dps = [], [], [], []
    for fi in range(n_fixed):
        f_id = f"{100 + fi}l"
        expert = (rng.rand(*shape) > 0.7).astype(np.int32)
        for mi in range(n_atlas):
            d_ids.append(f"{f_id}:m{200 + mi}l")
            labels.append(expert)
            noisy = expert.copy()
            noisy[rng.rand(*shape) > 0.9] ^= 1
            mods.append(noisy.astype(np.int32))
            dps.append(rng.randn())
    n = len(d_ids)
    snapshot = {
        "data_parameters": np.asarray(dps, np.float32),
        "d_ids": d_ids,
        "dataset_idxs": np.arange(n, dtype=np.int32),
        "image_paths": [f"/data/img_{i}.nii.gz" for i in range(n)],
        "label_paths": [f"/data/lbl_{i}.nii.gz" for i in range(n)],
        "labels": np.stack(labels),
        "modified_labels": np.stack(mods),
        "train_predictions": np.stack(labels),
        "disturb_flags": np.zeros(n, bool),
    }

    pth = tmp_path / "consensus_dict_synthetic.pth"
    cd = evaluate_consensus(snapshot, out_path=pth, staple_max_iterations=30)

    raw = torch.load(pth)
    assert set(raw) == {"100l", "101l"}
    for f_id, fixed in raw.items():
        # nnunet_prepare...py:34-41 discovers moving ids by removing EXACTLY
        # these keys — a missing one raises ValueError, an extra fixed-level
        # key would be misread as a moving id and crash on ['warped_label'].
        m_ids = list(fixed.keys())
        for k in (
            "dp_consensus", "staple_consensus", "expert_label", "prediction",
            "image_path", "dp_consensus_oracle_dice", "staple_consensus_oracle_dice",
        ):
            m_ids.remove(k)
        # m_id = _id[6:]: the 'm' marker is consumed (reference cell 6:35,
        # cell 13's moving ids are bare '102l'-style)
        assert sorted(m_ids) == ["200l", "201l", "202l"]
        # its dense reads
        assert fixed["expert_label"].is_sparse
        expert = fixed["expert_label"].to_dense()
        assert expert.shape == shape and expert.dtype == torch.int64
        for m in m_ids:
            assert fixed[m]["warped_label"].to_dense().shape == shape
        # cell 13's access patterns: prediction batch dim, sigmoid(dp).item(),
        # sensitivity as a bare multiplier
        assert fixed["prediction"].to_dense().shape == (1,) + shape
        overlay = torch.zeros(shape[:2])
        for m in m_ids:
            w = fixed[m]["warped_label"].to_dense()
            overlay += w[:, :, 2].float() * torch.sigmoid(fixed[m]["data_parameter"]).item()
            overlay += w[:, :, 2].float() * fixed[m]["staple_sensitivity"]
        # cell 9/13 uses torch.nn.functional.one_hot(...long()) on consensi
        torch.nn.functional.one_hot(fixed["dp_consensus"].to_dense(), 2)

    # cell 7 extract_consensus_dices pattern on the raw torch load
    dp_t = torch.cat([raw[f]["dp_consensus_oracle_dice"] for f in raw])[:, 1]
    st_t = torch.cat([raw[f]["staple_consensus_oracle_dice"] for f in raw])[:, 1]
    assert dp_t.shape == st_t.shape == (n_fixed,)
    assert float(dp_t.mean()) > 0.5  # mild corruption: consensus near expert

    # native loader round-trips to the in-memory evaluation result
    back = load_consensus_dicts_pth(pth)
    for f_id, fixed in cd.items():
        np.testing.assert_array_equal(back[f_id]["dp_consensus"], fixed["dp_consensus"])
        np.testing.assert_array_equal(back[f_id]["staple_consensus"], fixed["staple_consensus"])
        np.testing.assert_array_equal(back[f_id]["expert_label"], fixed["expert_label"])
        assert back[f_id]["image_path"] == fixed["image_path"]
        for m_id, mv in fixed.items():
            if not isinstance(mv, dict):
                continue
            np.testing.assert_array_equal(back[f_id][m_id]["warped_label"], mv["warped_label"])
            assert back[f_id][m_id]["data_parameter"] == pytest.approx(mv["data_parameter"])
            assert back[f_id][m_id]["staple_sensitivity"] == pytest.approx(
                mv["staple_sensitivity"]
            )
        np.testing.assert_allclose(
            back[f_id]["dp_consensus_oracle_dice"],
            np.asarray(fixed["dp_consensus_oracle_dice"], np.float32).reshape(1, -1),
            rtol=1e-6,
        )

    # our own cell-7 analogue accepts the .pth directly
    dp_ours, st_ours = extract_consensus_dices(pth)
    np.testing.assert_allclose(dp_ours, dp_t.numpy(), rtol=1e-6)
    np.testing.assert_allclose(st_ours, st_t.numpy(), rtol=1e-6)


def test_np_ops_match_jax_versions(rng):
    import jax.numpy as jnp

    from deep_staple_tpu.ops.resample import resize_nd, pad_to_size

    x = rng.rand(9, 8, 7).astype(np.float32)
    for mode, ac in (("nearest", False), ("linear", False), ("linear", True)):
        a = resize_nd_np(x, (5, 12, 6), mode=mode, align_corners=ac)
        b = np.asarray(resize_nd(jnp.asarray(x), (5, 12, 6), mode=mode, align_corners=ac))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        pad_to_size_np(x, (12, 11, 7)), np.asarray(pad_to_size(jnp.asarray(x), (12, 11, 7)))
    )


def test_native_batch_loader_matches_single(tmp_path, rng):
    """ds_load_nifti_batch (threaded C++ path) must produce the same arrays
    as per-file loads, including the Python fallback for a corrupt file."""
    from deep_staple_tpu.data.native_io import try_native_load_batch
    from deep_staple_tpu.data.nifti import save_nifti

    paths = []
    vols = []
    for i in range(5):
        v = rng.randn(7 + i, 6, 5).astype(np.float32)
        p = tmp_path / f"v{i}.nii.gz"
        save_nifti(p, v)
        paths.append(p)
        vols.append(v)

    out = try_native_load_batch(paths, n_threads=3)
    assert len(out) == 5
    for got, want in zip(out, vols):
        np.testing.assert_allclose(got, want.astype(np.float64), rtol=1e-6)


def test_native_loader_rejects_truncated_file(tmp_path, rng):
    """A truncated .nii (intact header, missing voxel payload) must fail
    cleanly through the native path — the batch wrapper falls back to the
    Python reader, which raises, instead of reading off the heap."""
    from deep_staple_tpu.data.native_io import _find_lib
    from deep_staple_tpu.data.nifti import save_nifti

    if _find_lib() is None:
        pytest.skip("native lib not built")
    p = tmp_path / "t.nii"
    save_nifti(p, rng.randn(8, 7, 6).astype(np.float32))
    data = p.read_bytes()
    p.write_bytes(data[: 352 + 40])  # keep header, drop most of the payload

    import ctypes

    lib = _find_lib()
    dims = (ctypes.c_longlong * 3)()
    buf = ctypes.POINTER(ctypes.c_float)()
    rc = lib.ds_load_nifti_f32(str(p).encode(), dims, ctypes.byref(buf))
    assert rc != 0  # clean error, no OOB read


def test_native_loader_autobuilds_after_reimage(tmp_path, rng, monkeypatch):
    """Box re-images wipe build artifacts but not the repo: when the .so is
    missing and source + build.sh are present, `_find_lib` rebuilds it once
    and the fast path comes back without manual intervention."""
    import shutil

    from deep_staple_tpu.data import native_io
    from deep_staple_tpu.data.nifti import save_nifti

    repo_native = Path(native_io.__file__).resolve().parent.parent.parent / "native"
    if not (repo_native / "deepstaple_native.cpp").is_file():
        pytest.skip("native source not present")
    native_dir = tmp_path / "native"
    native_dir.mkdir()
    shutil.copy(repo_native / "deepstaple_native.cpp", native_dir)
    shutil.copy(repo_native / "build.sh", native_dir)

    monkeypatch.setenv("DEEPSTAPLE_NATIVE_DIR", str(native_dir))
    monkeypatch.delenv("DEEPSTAPLE_NO_AUTOBUILD", raising=False)
    monkeypatch.setattr(native_io, "_LIB", None)
    monkeypatch.setattr(native_io, "_LIB_SEARCHED", False)
    try:
        lib = native_io._find_lib()
        if lib is None:
            # Distinguish a broken/absent toolchain (e.g. no g++, no zlib dev
            # library to satisfy -lz) from a real regression: the autobuilder
            # records the compiler's stderr, so skip with the actual cause.
            cause = native_io.LAST_AUTOBUILD_ERROR or "unknown (no error recorded)"
            if shutil.which("g++") is None or "cannot find -lz" in cause or "zlib" in cause:
                pytest.skip(f"native toolchain unavailable: {cause}")
            pytest.fail(f"autobuild failed on a host with g++: {cause}")
        assert (native_dir / "libdeepstaple_io.so").is_file()

        v = rng.randn(6, 5, 4).astype(np.float32)
        p = tmp_path / "v.nii.gz"
        save_nifti(p, v)
        np.testing.assert_allclose(
            native_io.try_native_load(p), v.astype(np.float64), rtol=1e-6
        )

        # Opt-out: with the .so wiped again and autobuild disabled, the
        # search degrades to the Python fallback instead of compiling.
        (native_dir / "libdeepstaple_io.so").unlink()
        monkeypatch.setenv("DEEPSTAPLE_NO_AUTOBUILD", "1")
        monkeypatch.setattr(native_io, "_LIB", None)
        monkeypatch.setattr(native_io, "_LIB_SEARCHED", False)
        assert native_io._find_lib() is None
        np.testing.assert_allclose(
            native_io.try_native_load(p), v.astype(np.float64), rtol=1e-6
        )
    finally:
        native_io._LIB = None
        native_io._LIB_SEARCHED = False


def test_right_side_flip_shares_arrays_across_atlas_instances(tmp_path, rng):
    """Atlas expansion aliases each fixed image across its instances; the
    right-side H-flip must preserve that sharing (flip the base array once)
    instead of materializing one flipped copy per atlas instance
    (crossmoda.py flip memo; reference semantics :283-293 unchanged)."""
    from deep_staple_tpu.data.crossmoda import get_crossmoda_data_load_closure

    img_dir = tmp_path / "L4_fine_localized_crop" / "target_training_unlabeled"
    lbl_dir = tmp_path / "L4_fine_localized_crop" / "__omitted_labels_target_training__"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    size = (8, 8, 8)
    img = rng.rand(*size).astype(np.float32)
    lbl = (rng.rand(*size) > 0.6).astype(np.int16)
    save_nifti(img_dir / "crossmoda_1_hrT2_r.nii.gz", img)
    save_nifti(lbl_dir / "crossmoda_1_hrT2_r_Label.nii.gz", lbl)

    override = {
        "001r:m001": (rng.rand(*size) > 0.5).astype(np.int16),
        "001r:m002": (rng.rand(*size) > 0.5).astype(np.int16),
    }
    closure = get_crossmoda_data_load_closure(
        base_dir=str(tmp_path), domain="target", state="l4",
        use_additional_data=False, size=size, resample=True,
        normalize=True, crop_3d_w_dim_range=None, ensure_labeled_pairs=True,
        modified_3d_label_override=override, debug=False,
    )
    _, _, img_data, lbl_data, mod_data, _, _ = closure()

    assert set(img_data) == {"001r:m001", "001r:m002"}
    # flipped once, shared — not duplicated per instance
    assert img_data["001r:m001"] is img_data["001r:m002"]
    assert lbl_data["001r:m001"] is lbl_data["001r:m002"]
    # flip actually applied (axis=1, reference :289-290)
    flipped_lbl = np.flip(lbl.astype(img_data["001r:m001"].dtype), axis=1)
    np.testing.assert_array_equal(lbl_data["001r:m001"], flipped_lbl)
    # modified labels come from the override (distinct per instance), flipped
    np.testing.assert_array_equal(
        mod_data["001r:m001"], np.flip(override["001r:m001"], axis=1)
    )
    assert mod_data["001r:m001"] is not mod_data["001r:m002"]
