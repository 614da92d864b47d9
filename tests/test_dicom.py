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


def _write_slice(path, z, rows=8, cols=10, value_base=100, pix=None,
                 series_uid=None, frame_uid=None):
    if pix is None:
        pix = (np.arange(rows * cols, dtype=np.uint16) + value_base + z).tobytes()
    uid_els = []
    if series_uid:
        uid_els.append(_el(0x0020, 0x000E, b"UI", _pad(series_uid)))
    if frame_uid:
        uid_els.append(_el(0x0020, 0x0052, b"UI", _pad(frame_uid)))
    body = b"".join(
        [
            _el(0x0008, 0x0060, b"CS", _pad("MR")),
            *uid_els,
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


def _write_rtstruct(path, square_mm=((2, 2), (6, 6)), zs=(2.0, 4.0),
                    ref_series_uid=None, ref_frame_uid=None):
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
    els = [_el(0x0008, 0x0060, b"CS", _pad("RTSTRUCT"))]
    if ref_series_uid or ref_frame_uid:
        # Referenced Frame of Reference Sequence: frame UID + nested
        # RTReferencedStudy -> RTReferencedSeries -> SeriesInstanceUID
        series_item = _item(_el(0x0020, 0x000E, b"UI", _pad(ref_series_uid or "")))
        study_item = _item(_el(0x3006, 0x0014, b"SQ", series_item))
        frame_body = (
            (_el(0x0020, 0x0052, b"UI", _pad(ref_frame_uid)) if ref_frame_uid else b"")
            + _el(0x3006, 0x0012, b"SQ", study_item)
        )
        els.append(_el(0x3006, 0x0010, b"SQ", _item(frame_body)))
    els += [
        _el(0x3006, 0x0020, b"SQ", roi_seq),
        _el(0x3006, 0x0039, b"SQ", contour_seq),
    ]
    _file(path, b"".join(els))


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


@pytest.fixture
def dicom_case_two_series(tmp_path):
    """T1 + T2 series with DIFFERENT geometries: the T1 stack starts 2 slices
    (4mm) deeper, so resampling T1 onto the T2 grid must shift the content by
    +2 slices — detectable in voxel space."""
    case = tmp_path / "vs_gk_2"
    (case / "MR_t1").mkdir(parents=True)
    (case / "MR_t2").mkdir()
    (case / "RTSTRUCT").mkdir()
    for z in range(5):
        _write_slice(case / "MR_t2" / f"slice{z}.dcm", z, value_base=100)
    for z in range(5):
        # T1 slices at world z = (z + 2) * 2mm, pixel values tied to WORLD z
        # so registered content can be compared across the two grids
        path = case / "MR_t1" / f"slice{z}.dcm"
        pix = (np.full(8 * 10, 50 + 10 * (z + 2), np.uint16)).tobytes()
        body = b"".join(
            [
                _el(0x0008, 0x0060, b"CS", _pad("MR")),
                _el(0x0020, 0x0032, b"DS", _pad(f"0\\0\\{(z + 2) * 2.0}")),
                _el(0x0020, 0x0037, b"DS", _pad("1\\0\\0\\0\\1\\0")),
                _el(0x0028, 0x0010, b"US", struct.pack("<H", 8)),
                _el(0x0028, 0x0011, b"US", struct.pack("<H", 10)),
                _el(0x0028, 0x0030, b"DS", _pad("1.0\\1.0")),
                _el(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
                _el(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
                _el(0x7FE0, 0x0010, b"OW", pix),
            ]
        )
        _file(path, body)
    _write_rtstruct(case / "RTSTRUCT" / "rs.dcm")
    return case


def test_convert_case_register_t2_with_shipped_tfm(dicom_case_two_series, tmp_path):
    """--register T2 parity (`data_conversion.py:488-496,541-548`): the
    shipped identity .tfm resamples T1 onto the T2 grid; the geometric slice
    offset between the stacks must be resolved by the resample."""
    from deep_staple_tpu.data.nifti import load_nifti
    from deep_staple_tpu.tools.register import write_itk_tfm

    # shared frame of reference: identity transform (the real dataset ships
    # non-trivial inv_T1_LPS_to_T2_LPS.tfm files; geometry still differs)
    write_itk_tfm(
        dicom_case_two_series / "MR_t1" / "inv_T1_LPS_to_T2_LPS.tfm", np.eye(4)
    )
    out = tmp_path / "out"
    written = convert_case(dicom_case_two_series, out, register="T2")
    names = sorted(p.name for p in written)
    assert names == [
        "vs_gk_2_Label.nii.gz",
        "vs_gk_2_mr_t1.nii.gz",
        "vs_gk_2_mr_t1_refT2.nii.gz",
        "vs_gk_2_mr_t2.nii.gz",
        "vs_gk_2_mr_t2_refT2.nii.gz",
    ]
    reg = load_nifti(out / "vs_gk_2_mr_t1_refT2.nii.gz").get_fdata()
    t2 = load_nifti(out / "vs_gk_2_mr_t2.nii.gz").get_fdata()
    assert reg.shape == t2.shape
    # T2 grid slice s is at world z = 2s mm; T1 content there has value
    # 50 + 10 * (world_z / 2) = 50 + 10 * s; T1 only covers world slices 2-6.
    for s in range(2, 5):
        np.testing.assert_allclose(reg[:, :, s], 50 + 10 * s, rtol=1e-6)
    assert reg[:, :, 0].max() == 0.0  # outside the T1 stack -> default 0
    # the label rasterizes on the reference (T2) grid
    lbl = load_nifti(out / "vs_gk_2_Label.nii.gz").get_fdata()
    assert lbl.shape == t2.shape and lbl.sum() > 0


@pytest.fixture
def dicom_case_registered_contours(tmp_path):
    """Distinct frames of reference + a NON-identity shipped transform, with
    the RTSTRUCT defined on the MOVING (T1) series — the real TCIA shape the
    reference handles via RTSS.SetAndObserveTransformNodeID
    (`data_conversion.py:495-505`)."""
    from deep_staple_tpu.tools.register import write_itk_tfm

    case = tmp_path / "vs_gk_3"
    (case / "MR_t1").mkdir(parents=True)
    (case / "MR_t2").mkdir()
    (case / "RTSTRUCT").mkdir()
    for z in range(5):
        _write_slice(case / "MR_t2" / f"slice{z}.dcm", z, value_base=100,
                     series_uid="1.2.3.S2", frame_uid="1.2.3.F2")
    for z in range(5):
        # constant per-slice values so the resample shift is observable
        pix = np.full(8 * 10, 50 + 10 * z, np.uint16).tobytes()
        _write_slice(case / "MR_t1" / f"slice{z}.dcm", z, pix=pix,
                     series_uid="1.2.3.S1", frame_uid="1.2.3.F1")
    # pull-back (the .tfm file matrix): p_T1 = p_T2 + 4mm along z
    tfm = np.eye(4)
    tfm[2, 3] = 4.0
    write_itk_tfm(case / "MR_t1" / "inv_T1_LPS_to_T2_LPS.tfm", tfm)
    # contours in MOVING (T1) world coords at z = 6, 8 mm, referencing T1
    _write_rtstruct(case / "RTSTRUCT" / "rs.dcm", zs=(6.0, 8.0),
                    ref_series_uid="1.2.3.S1", ref_frame_uid="1.2.3.F1")
    return case


def test_rtstruct_references(dicom_case_registered_contours):
    from deep_staple_tpu.tools.dicom import rtstruct_references

    refs = rtstruct_references(
        dicom_case_registered_contours / "RTSTRUCT" / "rs.dcm"
    )
    assert refs["frame_of_reference"] == "1.2.3.F1"
    assert refs["series_uids"] == ["1.2.3.S1"]


def test_registered_contours_ride_the_transform(dicom_case_registered_contours, tmp_path):
    """--register T2 with contours defined on the moving T1 series and a
    non-identity .tfm: the exported label must land where the REGISTERED
    image content lands (fixed world z = moving z - 4mm -> slices 1, 2), not
    at the raw contour z (slices 3, 4)."""
    from deep_staple_tpu.data.nifti import load_nifti

    out = tmp_path / "out_reg"
    convert_case(dicom_case_registered_contours, out, register="T2")

    # image: fixed slice s samples moving world z = 2s + 4 -> value 50+10(s+2)
    reg = load_nifti(out / "vs_gk_3_mr_t1_refT2.nii.gz").get_fdata()
    for s in range(0, 3):
        np.testing.assert_allclose(reg[:, :, s], 50 + 10 * (s + 2), rtol=1e-6)

    lbl = load_nifti(out / "vs_gk_3_Label.nii.gz").get_fdata()
    assert lbl[:, :, 1].sum() > 0 and lbl[:, :, 2].sum() > 0
    assert lbl[:, :, 3].sum() == 0 and lbl[:, :, 4].sum() == 0


def test_convert_case_register_estimates_when_no_tfm(dicom_case_two_series, tmp_path):
    """Without a shipped .tfm the converter estimates the affine first-party
    (a capability the reference LACKS — it hard-requires the dataset's
    transform files). The synthetic stacks share a world frame, so the
    estimate must stay near identity and the resample must still undo the
    2-slice geometric offset."""
    from deep_staple_tpu.data.nifti import load_nifti

    out = tmp_path / "out_est"
    convert_case(dicom_case_two_series, out, register="T2")
    reg = load_nifti(out / "vs_gk_2_mr_t1_refT2.nii.gz").get_fdata()
    # constant-per-slice volumes leave translation along z observable; the
    # estimator must keep the content within ~half a slice of the truth
    for s in (3, 4):
        got = float(np.median(reg[:, :, s]))
        assert abs(got - (50 + 10 * s)) < 6.0, (s, got)
