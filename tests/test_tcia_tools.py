"""TCIA preprocessing tools: DICOM modality/case routing (tcia_sort,
reference TCIA_data_convert_into_convenient_folder_structure.py) and the
TCIA->CrossMoDa renaming/label aggregation (tcia_to_crossmoda.py)."""

import csv
import struct

import numpy as np

from test_dicom import _el, _file, _pad

from deep_staple_tpu.data.nifti import load_nifti, save_nifti
from deep_staple_tpu.tools import tcia_sort, tcia_to_crossmoda


def _write_tagged_dicom(path, modality: str, desc: str, patient: str):
    pix = np.zeros(4, np.uint16).tobytes()
    body = b"".join(
        [
            _el(0x0008, 0x0060, b"CS", _pad(modality)),
            _el(0x0008, 0x103E, b"LO", _pad(desc)),
            _el(0x0010, 0x0020, b"LO", _pad(patient)),
            _el(0x0028, 0x0010, b"US", struct.pack("<H", 2)),
            _el(0x0028, 0x0011, b"US", struct.pack("<H", 2)),
            _el(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
            _el(0x7FE0, 0x0010, b"OW", pix),
        ]
    )
    _file(path, body)


def test_tcia_sort_routes_by_modality_and_case(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    _write_tagged_dicom(raw / "a.dcm", "MR", "t1 contrast", "VS-SEG-042")
    _write_tagged_dicom(raw / "b.dcm", "MR", "hr t2 axial", "VS-SEG-042")
    _write_tagged_dicom(raw / "c.dcm", "RTSTRUCT", "contours", "VS-SEG-042")
    _write_tagged_dicom(raw / "d.dcm", "RTDOSE", "dose", "VS-SEG-7")
    (raw / "notes.txt").write_text("not dicom")

    out = tmp_path / "sorted"
    tcia_sort.main(["--input", str(raw), "--output", str(out)])

    assert (out / "vs_gk_042" / "MR_t1" / "a.dcm").is_file()
    assert (out / "vs_gk_042" / "MR_t2" / "b.dcm").is_file()
    assert (out / "vs_gk_042" / "RTSTRUCT" / "c.dcm").is_file()
    assert (out / "vs_gk_7" / "RTDOSE" / "d.dcm").is_file()
    assert not list(out.rglob("notes.txt"))


def test_tcia_to_crossmoda_routing_and_label_aggregation(tmp_path):
    conv = tmp_path / "converted"
    conv.mkdir()
    rng = np.random.RandomState(0)
    img = rng.randn(6, 5, 4).astype(np.float32)
    # label classes: 1,2 tumour+cochlea plus an extra class 3 to be dropped
    lbl = np.zeros((6, 5, 4), np.int16)
    lbl[1:3, 1:3, 1:3] = 1
    lbl[4, 4, 3] = 2
    lbl[0, 0, 0] = 3
    save_nifti(conv / "vs_gk_42_t1.nii.gz", img)
    save_nifti(conv / "vs_gk_42_t1_Label.nii.gz", lbl)

    mapping = tmp_path / "map.csv"
    with open(mapping, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["tcia_id", "crossmoda_name", "split"])
        w.writeheader()
        w.writerow({"tcia_id": "vs_gk_42", "crossmoda_name": "crossmoda_42", "split": "source_training"})

    out = tmp_path / "L1"
    tcia_to_crossmoda.main(["--input", str(conv), "--mapping", str(mapping), "--output", str(out)])

    img_dir, lbl_dir = tcia_to_crossmoda.SPLIT_DIRS["source_training"]
    routed_img = out / img_dir / "crossmoda_42.nii.gz"
    routed_lbl = out / lbl_dir / "crossmoda_42_Label.nii.gz"
    assert routed_img.is_file() and routed_lbl.is_file()
    agg = load_nifti(routed_lbl).get_fdata()
    # tumour stays 1, cochlea stays 2, other classes drop to background
    assert set(np.unique(agg)) == {0.0, 1.0, 2.0}
    assert agg[0, 0, 0] == 0.0
    np.testing.assert_array_equal(agg[1:3, 1:3, 1:3], 1.0)
