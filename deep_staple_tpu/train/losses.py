"""Loss functions of the DeepSTAPLE training objective.

All semantics cite `main_deep_staple.py`:
  * class-weighted CE with torch `CrossEntropyLoss(weight)` weighted-mean
    reduction (:716),
  * per-sample voxel-mean CE for the DP loss (:738-739),
  * data-parameter weighting: sigmoid, batch-mean normalization (:741-744),
    optional fixed weighting divide (:747-748),
  * risk regularization -w * |pred>0| / numel (:750-757).

Logits are channels-last (B, *spatial, C).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _nll(logits, targets):
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot multiply instead of take_along_axis: the gather's backward is a
    # scatter-add over the full logits tensor, which lowers to a slow sorted
    # scatter on TPU; the one-hot form is pure elementwise in both directions
    # (C is tiny, so the extra C-x read traffic is negligible).
    onehot = jax.nn.one_hot(targets, logits.shape[-1], dtype=logp.dtype)
    return -jnp.sum(logp * onehot, axis=-1)


def weighted_cross_entropy(logits, targets, class_weights):
    """torch nn.CrossEntropyLoss(weight=class_weights) semantics: weighted
    mean = sum(w[t]*nll) / sum(w[t]).

    The per-voxel weight lookup is a select-sum over the (tiny) class axis
    rather than `class_weights[targets]` — a 2-element gather indexed by 22M
    targets costs ~175ms/step on TPU, the select is free.
    """
    nll = _nll(logits, targets)
    w = 0.0
    for c in range(class_weights.shape[0]):
        w = w + class_weights[c] * (targets == c)
    return jnp.sum(nll * w) / jnp.sum(w)


def per_sample_cross_entropy(logits, targets):
    """Unweighted CE, voxel-mean per batch sample -> (B,)."""
    nll = _nll(logits, targets)
    return jnp.mean(nll.reshape(nll.shape[0], -1), axis=-1)


def dp_weights_from_params(bare_params_batch, fixed_weighting_batch=None):
    """sigmoid -> batch-mean normalize -> optional fixed-weighting divide."""
    w = jax.nn.sigmoid(bare_params_batch)
    w = w / jnp.mean(w)
    if fixed_weighting_batch is not None:
        w = w / fixed_weighting_batch
    return w


def dp_loss_fn(
    dp_logits,
    targets,
    bare_params_batch,
    fixed_weighting_batch=None,
    use_risk_regularization: bool = True,
):
    """The full data-parameter loss (sum-reduced, reference :738-759)."""
    ce = per_sample_cross_entropy(dp_logits, targets)
    w = dp_weights_from_params(bare_params_batch, fixed_weighting_batch)
    loss = jnp.sum(ce * w)
    if use_risk_regularization:
        pred = jnp.argmax(dp_logits, axis=-1)
        p_pred_num = jax.lax.stop_gradient(
            jnp.sum((pred > 0).reshape(pred.shape[0], -1), axis=-1).astype(jnp.float32)
        )
        numel = float(math.prod(pred.shape[1:]))
        loss = loss + jnp.sum(-w * p_pred_num / numel)
    return loss
