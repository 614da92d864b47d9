from .nifti import load_nifti, save_nifti, NiftiImage
from .hybrid_dataset import HybridIdDataset
from .crossmoda import get_crossmoda_data_load_closure, CrossmodaHybridIdDataset
from .synthetic import generate_synthetic_crossmoda

__all__ = [
    "load_nifti",
    "save_nifti",
    "NiftiImage",
    "HybridIdDataset",
    "get_crossmoda_data_load_closure",
    "CrossmodaHybridIdDataset",
    "generate_synthetic_crossmoda",
]
