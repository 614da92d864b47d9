"""Hard Dice metrics over one-hot labels.

Semantics match the reference implementation (`deep_staple/metrics.py:68-111`):
per-batch-sample, per-class Dice = 2*TP / (|pred==c| + |target==c| + eps), where
eps is 0 (NaN result) when ``nan_for_unlabeled_target`` and 1e-10 otherwise.

Unlike the reference's per-class Python loop, classes are reduced in one
vectorized XLA reduction (classes stay a tensor axis), which fuses into a
single pass over the volume on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _dice_nd(predicted, target, one_hot_torch_style: bool, nan_for_unlabeled_target: bool):
    if one_hot_torch_style:
        # (B, *spatial, C) -> (B, C, *spatial)
        predicted = jnp.moveaxis(predicted, -1, 1)
        target = jnp.moveaxis(target, -1, 1)

    pred_pos = predicted == 1
    tgt_pos = target == 1

    reduce_axes = tuple(range(2, predicted.ndim))
    tp = jnp.sum(jnp.logical_and(pred_pos, tgt_pos), axis=reduce_axes).astype(jnp.float32)
    pred_count = jnp.sum(pred_pos, axis=reduce_axes).astype(jnp.float32)
    tgt_count = jnp.sum(tgt_pos, axis=reduce_axes).astype(jnp.float32)

    denom = pred_count + tgt_count
    if nan_for_unlabeled_target:
        # 0/0 -> NaN, like the reference's bare division.
        return jnp.where(denom > 0, 2.0 * tp / jnp.where(denom > 0, denom, 1.0), jnp.nan)
    return 2.0 * tp / (denom + 1e-10)


def dice2d(predicted_lbls, target_lbls, one_hot_torch_style: bool, nan_for_unlabeled_target: bool = True):
    """Per-sample/per-class hard Dice for 2D one-hot labels.

    Args:
        predicted_lbls: (B, C, H, W), or (B, H, W, C) when ``one_hot_torch_style``.
        target_lbls: same shape as ``predicted_lbls``.
    Returns:
        (B, C) float32 Dice scores. Reference: `deep_staple/metrics.py:7-29`.
    """
    assert predicted_lbls.ndim == 4, f"2D dice input must be 4D but is {predicted_lbls.shape}"
    assert predicted_lbls.shape == target_lbls.shape
    return _dice_nd(predicted_lbls, target_lbls, one_hot_torch_style, nan_for_unlabeled_target)


def dice3d(predicted_lbls, target_lbls, one_hot_torch_style: bool, nan_for_unlabeled_target: bool = True):
    """Per-sample/per-class hard Dice for 3D one-hot labels.

    Args:
        predicted_lbls: (B, C, D, H, W), or (B, D, H, W, C) when ``one_hot_torch_style``.
        target_lbls: same shape as ``predicted_lbls``.
    Returns:
        (B, C) float32 Dice scores. Reference: `deep_staple/metrics.py:37-60`.
    """
    assert predicted_lbls.ndim == 5, f"3D dice input must be 5D but is {predicted_lbls.shape}"
    assert predicted_lbls.shape == target_lbls.shape
    return _dice_nd(predicted_lbls, target_lbls, one_hot_torch_style, nan_for_unlabeled_target)


def dice_from_int_labels(pred, target, num_classes: int, nan_for_unlabeled_target: bool = True):
    """Per-sample/per-class Dice directly from integer label maps.

    Mathematically identical to `dice3d(one_hot(pred), one_hot(target), ...)`
    but never materializes the one-hot volumes — the per-class masks fuse into
    three reductions per class. Used in the jitted train/eval steps where the
    (B, *spatial, C) one-hot tensors would dominate HBM traffic.
    """
    reduce_axes = tuple(range(1, pred.ndim))
    outs = []
    for c in range(num_classes):
        p = pred == c
        t = target == c
        tp = jnp.sum(jnp.logical_and(p, t), axis=reduce_axes).astype(jnp.float32)
        pc = jnp.sum(p, axis=reduce_axes).astype(jnp.float32)
        tc = jnp.sum(t, axis=reduce_axes).astype(jnp.float32)
        denom = pc + tc
        if nan_for_unlabeled_target:
            outs.append(jnp.where(denom > 0, 2.0 * tp / jnp.where(denom > 0, denom, 1.0), jnp.nan))
        else:
            outs.append(2.0 * tp / (denom + 1e-10))
    return jnp.stack(outs, axis=-1)


def batch_dice_over_all(b_dice, exclude_bg: bool = True) -> float:
    """NaN-mean of a (B, C) dice tensor over all samples/classes.

    Reference: `deep_staple/utils/torch_utils.py:272-277`.
    """
    start = 1 if exclude_bg else 0
    sub = b_dice[:, start:]
    import numpy as np

    sub = np.asarray(sub)
    if np.all(np.isnan(sub)):
        return float("nan")
    return float(np.nanmean(sub))


def batch_dice_per_class(b_dice, class_tags, exclude_bg: bool = True) -> dict:
    """Per-class NaN-mean dict. Reference: `deep_staple/utils/torch_utils.py:255-268`."""
    import numpy as np

    score = {}
    arr = np.asarray(b_dice)
    for cls_idx, tag in enumerate(class_tags):
        if exclude_bg and cls_idx == 0:
            continue
        col = arr[:, cls_idx]
        score[tag] = float("nan") if np.all(np.isnan(col)) else float(np.nanmean(col))
    return score
