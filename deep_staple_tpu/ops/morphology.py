"""Label morphology utilities.

`dilate_label_class` mirrors `utils/torch_utils.py:36-63`: binary dilation of
one class of an integer label map with a cubic structuring element, writing
the dilated class back over the label. Implemented with
`lax.reduce_window` max-pooling (a boolean dilation is a windowed OR), which
XLA fuses far better than the reference's ones-kernel convolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dilate_label_class(b_label, class_max_idx: int, class_dilate_idx: int, use_2d: bool, kernel_sz: int = 3):
    """b_label: (B, *spatial) int labels. Returns labels with
    `class_dilate_idx` dilated by a kernel_sz^N window."""
    if kernel_sz < 2:
        return b_label
    ndim = 2 if use_2d else 3
    mask = (b_label == class_dilate_idx).astype(jnp.float32)
    window = (1,) + (kernel_sz,) * ndim
    pad = ((0, 0),) + ((kernel_sz // 2, kernel_sz - 1 - kernel_sz // 2),) * ndim
    dilated = jax.lax.reduce_window(mask, -jnp.inf, jax.lax.max, window, (1,) * (ndim + 1), pad)
    return jnp.where(dilated > 0, class_dilate_idx, b_label)
