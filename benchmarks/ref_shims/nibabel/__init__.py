"""nibabel stand-in backed by the rebuild's first-party NIfTI reader.

The reference's training path only calls `nib.load(path).get_fdata()`
(`CrossmodaHybridIdLoader.py:186,204`); postprocessing additionally uses
`Nifti1Image`/`nib.save`. All three are provided here on top of
`deep_staple_tpu.data.nifti`, which both proves the rebuild's reader against
the reference's consumption pattern and lets the reference run on a box
without nibabel installed.
"""

import numpy as _np

from deep_staple_tpu.data.nifti import load_nifti as _load_nifti
from deep_staple_tpu.data.nifti import save_nifti as _save_nifti


class Nifti1Image:
    def __init__(self, dataobj, affine=None, header=None):
        self._data = _np.asarray(dataobj)
        self.affine = affine if affine is not None else _np.eye(4)
        self.header = header

    def get_fdata(self):
        return self._data.astype(_np.float64)


def load(path):
    return _load_nifti(path)


def save(img, path):
    _save_nifti(path, img.get_fdata())
