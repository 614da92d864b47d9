"""First-party DICOM reader/converter tests against synthetically written
Part-10 files (explicit VR little endian)."""

import struct
from pathlib import Path

import numpy as np
import pytest

from deep_staple_tpu.tools.dicom import (
    load_series,
    load_rtstruct,
    rasterize_contours,
    read_dicom,
)
from deep_staple_tpu.tools.dicom_convert import convert_case


def _el(group, elem, vr, value: bytes) -> bytes:
    head = struct.pack("<HH", group, elem) + vr
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + struct.pack("<H", len(value)) + value


def _pad(s: str) -> bytes:
    b = s.encode()
    return b + b" " if len(b) % 2 else b


def _file(path: Path, body: bytes):
    meta = _el(0x0002, 0x0010, b"UI", _pad("1.2.840.10008.1.2.1"))
    path.write_bytes(b"\x00" * 128 + b"DICM" + meta + body)


def _write_slice(path, z, rows=8, cols=10, value_base=100):
    pix = (np.arange(rows * cols, dtype=np.uint16) + value_base + z).tobytes()
    body = b"".join(
        [
            _el(0x0008, 0x0060, b"CS", _pad("MR")),
            _el(0x0020, 0x0032, b"DS", _pad(f"0\\0\\{z * 2.0}")),
            _el(0x0020, 0x0037, b"DS", _pad("1\\0\\0\\0\\1\\0")),
            _el(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
            _el(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
            _el(0x0028, 0x0030, b"DS", _pad("1.0\\1.0")),
            _el(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
            _el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
            _el(0x7FE0, 0x0010, b"OW", pix),
        ]
    )
    _file(path, body)


def _item(body: bytes) -> bytes:
    return struct.pack("<HHI", 0xFFFE, 0xE000, len(body)) + body


def _write_rtstruct(path, square_mm=((2, 2), (6, 6)), zs=(2.0, 4.0)):
    (x0, y0), (x1, y1) = square_mm
    contours = b""
    for z in zs:
        pts = f"{x0}\\{y0}\\{z}\\{x1}\\{y0}\\{z}\\{x1}\\{y1}\\{z}\\{x0}\\{y1}\\{z}"
        contours += _item(_el(0x3006, 0x0050, b"DS", _pad(pts)))
    roi_seq = _item(
        _el(0x3006, 0x0022, b"IS", _pad("1")) + _el(0x3006, 0x0026, b"LO", _pad("tumour"))
    )
    contour_seq = _item(
        _el(0x3006, 0x0084, b"IS", _pad("1")) + _el(0x3006, 0x0040, b"SQ", contours)
    )
    body = b"".join(
        [
            _el(0x0008, 0x0060, b"CS", _pad("RTSTRUCT")),
            _el(0x3006, 0x0020, b"SQ", roi_seq),
            _el(0x3006, 0x0039, b"SQ", contour_seq),
        ]
    )
    _file(path, body)


@pytest.fixture
def dicom_case(tmp_path):
    case = tmp_path / "vs_gk_1"
    (case / "MR_t2").mkdir(parents=True)
    (case / "RTSTRUCT").mkdir()
    for z in range(5):
        _write_slice(case / "MR_t2" / f"slice{z}.dcm", z)
    _write_rtstruct(case / "RTSTRUCT" / "rs.dcm")
    return case


def test_read_dicom_elements(dicom_case):
    ds = read_dicom(dicom_case / "MR_t2" / "slice0.dcm")
    assert ds.str_value((0x0008, 0x0060)) == "MR"
    assert ds.int_value((0x0028, 0x0010)) == 8


def test_load_series_geometry(dicom_case):
    series = load_series(sorted((dicom_case / "MR_t2").glob("*.dcm")))
    assert series.volume.shape == (8, 10, 5)
    # z spacing 2.0 from positions
    np.testing.assert_allclose(series.affine[2, 2], 2.0)
    # values increase with slice index (sorted correctly)
    assert series.volume[0, 0, 4] > series.volume[0, 0, 0]


def test_rtstruct_rasterization(dicom_case):
    series = load_series(sorted((dicom_case / "MR_t2").glob("*.dcm")))
    rois = load_rtstruct(dicom_case / "RTSTRUCT" / "rs.dcm")
    assert list(rois.keys()) == ["tumour"]
    mask = rasterize_contours(rois["tumour"], series)
    assert mask.shape == series.volume.shape
    # square (2..6)mm at 1mm spacing on slices z=2mm,4mm -> slice idx 1, 2
    assert mask[:, :, 1].sum() > 0 and mask[:, :, 2].sum() > 0
    assert mask[:, :, 0].sum() == 0
    assert mask[4, 4, 1] == 1 and mask[0, 0, 1] == 0


def test_convert_case(dicom_case, tmp_path):
    out = tmp_path / "out"
    written = convert_case(dicom_case, out)
    names = sorted(p.name for p in written)
    assert names == ["vs_gk_1_Label.nii.gz", "vs_gk_1_mr_t2.nii.gz"]
    from deep_staple_tpu.data.nifti import load_nifti

    lbl = load_nifti(out / "vs_gk_1_Label.nii.gz").get_fdata()
    assert lbl.max() == 1 and lbl.sum() > 0
