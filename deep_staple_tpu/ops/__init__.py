from .dice import dice2d, dice3d, dice_from_int_labels, batch_dice_over_all, batch_dice_per_class
from .morphology import dilate_label_class
from .mind import mindssc
from .resample import resize_nd, interpolate_sample, pad_to_size, crop_w_dim
from .grid_sample import grid_sample_2d, grid_sample_3d, affine_grid_2d, affine_grid_3d
from .stacking import (
    make_2d_stack_from_3d,
    make_3d_from_2d_stack,
    get_2d_stack_batch_size,
)

__all__ = [
    "dice2d",
    "dice3d",
    "dice_from_int_labels",
    "dilate_label_class",
    "mindssc",
    "batch_dice_over_all",
    "batch_dice_per_class",
    "resize_nd",
    "interpolate_sample",
    "pad_to_size",
    "crop_w_dim",
    "grid_sample_2d",
    "grid_sample_3d",
    "affine_grid_2d",
    "affine_grid_3d",
    "make_2d_stack_from_3d",
    "make_3d_from_2d_stack",
    "get_2d_stack_batch_size",
]
