"""Fused jitted train/eval steps.

One `train_step` call performs what the reference does across
`main_deep_staple.py:673-795` per batch — including the work the reference did
on the *host* in `HybridIdLoader.__getitem__` (pre-interpolation + b-spline/
affine augmentation, :325-338), which here runs on-device inside the same jit:

  1. device-side augmentation at pre_interpolation_factor (train path),
  2. forward + class-weighted CE + AdamW update of the model (:707-721),
  3. the data-parameter pass:
       - 'strict' OOL: a second forward with the *updated* params, matching
         the reference's out-of-line schedule exactly (:724-729),
       - 'fused' OOL: reuse stop_gradient(logits) from step 2 (one forward,
         mathematically the same gradient w.r.t. the DP vector, evaluated at
         the pre-update params) — the fast path,
       - non-OOL: dp_loss backprops into the model too (:731-736,769-773),
  4. SparseAdam update of touched DP rows (:761-773),
  5. per-class train Dice vs the *clean* label (:782-786).

Everything is GSPMD-ready: with a batch sharded over a ('data',) mesh axis,
batch-mean weight normalization and BN batch statistics become global means
automatically (XLA inserts the collectives).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.config import DataParamMode, TrainConfig
from ..ops.augment import AugmentParams, augment_sample_pair
from ..ops.dice import dice_from_int_labels
from ..ops.resample import interpolate_sample
from .losses import dp_loss_fn, weighted_cross_entropy
from .optim import sparse_adam_update
from .state import DeepStapleState


def _featurize(images, use_mind: bool, use_2d: bool):
    """(B, *spatial) image -> (B, *spatial, C) channels-last network input,
    optionally replacing intensity with 12-channel MIND-SSC descriptors
    (reference `main_deep_staple.py:691-698`)."""
    if not use_mind:
        return images[..., None]
    from ..ops.mind import mindssc

    if use_2d:
        # MIND 2D: treat the slice as a depth-1 volume (reference :691-693)
        feats = mindssc(images[:, None, None])  # (B, 12, 1, H, W)
        return jnp.moveaxis(feats[:, :, 0], 1, -1)
    feats = mindssc(images[:, None])  # (B, 12, D, H, W)
    return jnp.moveaxis(feats, 1, -1)


def _forward(model, params, batch_stats, images, train: bool, dropout_rng=None,
             use_mind: bool = False, use_2d: bool = False):
    """images: (B, *spatial) -> logits (B, *spatial, C); returns new batch_stats."""
    variables = {"params": params, "batch_stats": batch_stats}
    x = _featurize(images, use_mind, use_2d)
    if train:
        out, mutated = model.apply(
            variables, x, train=True, rngs={"dropout": dropout_rng}, mutable=["batch_stats"]
        )
        return out["out"], mutated["batch_stats"]
    out = model.apply(variables, x, train=False)
    return out["out"], batch_stats


def resolve_augment_order(order: str, num_classes: int) -> str:
    """Effective augment order for a dataset's class count.

    The '-int6' fused warp and the '-sep' separable warp pack each label
    voxel as a 2-bit (label | modified<<1) code inside the image gather word
    (ops/augment.py::_warp_fused_int6pack, ops/sep_warp.py) — they only
    represent binary labels. For any other class count, downgrade to the
    matching '-int8' order (same warp field and augmentation distribution,
    exact integer labels). All other orders pass through unchanged.
    """
    if order.endswith("-int6") and num_classes != 2:
        return order[: -len("-int6")] + "-int8"
    if order.endswith("-sep") and num_classes != 2:
        return order[: -len("-sep")] + "-int8"
    return order


def make_train_step(model, tx, config: TrainConfig, class_weights, fixed_weighting,
                    augment_params: AugmentParams = AugmentParams(),
                    pre_interpolation_factor: float = 1.5,
                    augment: bool = True, mesh=None):
    """Build the jitted train step.

    Args:
        class_weights: f32[num_classes] (reference :650-651).
        fixed_weighting: f32[dataset_len] log(gt_num+e)+e (reference :653).
        augment: device-side augmentation, on by default like the reference's
            train() path (:666). False feeds the batch through raw — used by
            the torch-parity gate, where both sides must see identical voxels.
        mesh: optional device mesh. Only the '-sep' augment order consumes it
            (shard_map of the Pallas scanline passes over the 'data' axis —
            ops/sep_warp.py::sep_warp_apply); every other op in the step is
            GSPMD-native and needs no mesh plumbing.
    """
    use_dp = config.data_param_mode == DataParamMode.INSTANCE_PARAMS
    use_2d = config.use_2d_normal_to is not None
    if (
        config.augment_order.endswith("-int6") or config.augment_order.endswith("-sep")
    ) and len(class_weights) != 2:
        # These warps pack each label as a 2-bit (label | modified<<1) code
        # (ops/augment.py::_warp_fused_int6pack, ops/sep_warp.py) — binary
        # labels only.
        raise ValueError(
            f"augment_order {config.augment_order!r} supports binary labels only "
            f"(got {len(class_weights)} classes); use 'fast-int8' instead"
        )
    class_weights = jnp.asarray(class_weights, jnp.float32)
    fixed_weighting = jnp.asarray(fixed_weighting, jnp.float32)

    def _prepare(batch, rng):
        img = batch["image"]
        lbl = batch["label"]
        mod = batch["modified_label"]
        if augment:
            img, lbl, mod, _ = augment_sample_pair(
                rng, img, lbl, mod, params=augment_params,
                pre_interpolation_factor=pre_interpolation_factor, use_2d=use_2d,
                order=config.augment_order,
                mesh=mesh if config.augment_order.endswith("-sep") else None,
            )
        return img, lbl, mod

    def _dp_pass(dp_logits, mod, dp_params, idxs):
        def dp_objective(dp_vec):
            bare = dp_vec[idxs]
            fixed = fixed_weighting[idxs] if config.use_fixed_weighting else None
            return dp_loss_fn(
                dp_logits, mod, bare, fixed,
                use_risk_regularization=config.use_risk_regularization,
            )

        return jax.value_and_grad(dp_objective)(dp_params)

    @jax.jit
    def train_step(state: DeepStapleState, batch, lr, rng):
        rng_aug, rng_drop, rng_drop2 = jax.random.split(rng, 3)
        img, lbl, mod = _prepare(batch, rng_aug)
        idxs = batch["dataset_idx"]

        metrics = {}

        fwd = partial(_forward, use_mind=config.use_mind, use_2d=use_2d)

        if use_dp and not config.use_ool_dp_loss:
            # Non-OOL: one forward; dp_loss updates BOTH model and DP vector
            # (reference :731-736, 769-773). CE is computed only as a metric.
            def loss_fn(params, dp_vec):
                logits, new_stats = fwd(model, params, state.batch_stats, img, True, rng_drop)
                bare = dp_vec[idxs]
                fixed = fixed_weighting[idxs] if config.use_fixed_weighting else None
                loss = dp_loss_fn(logits, mod, bare, fixed, config.use_risk_regularization)
                return loss, (logits, new_stats)

            (dp_loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, state.dp_params)
            model_grads, dp_grads = grads
            updates, new_opt_state = tx.update(
                model_grads, _with_lr(state.opt_state, lr), state.params
            )
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            ce_loss = weighted_cross_entropy(logits, mod, class_weights)
            metrics["dp_loss"] = dp_loss
        else:
            # CE pass + model update (reference :716-721).
            def ce_fn(params):
                logits, new_stats = fwd(model, params, state.batch_stats, img, True, rng_drop)
                return weighted_cross_entropy(logits, mod, class_weights), (logits, new_stats)

            (ce_loss, (logits, new_stats)), model_grads = jax.value_and_grad(ce_fn, has_aux=True)(
                state.params
            )
            updates, new_opt_state = tx.update(
                model_grads, _with_lr(state.opt_state, lr), state.params
            )
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

            if use_dp:
                if config.ool_mode == "strict":
                    # Reference-exact: second forward with the UPDATED params;
                    # BN runs in train mode again so running stats advance twice
                    # per batch like the reference (:724-729).
                    #
                    # bn_mode='async' exception: FWD#2 must normalize through
                    # the STEP-START stats, not the ones FWD#1 just updated —
                    # normalizing activations of a regime the fresh stats were
                    # not measured under is the async staleness amplification
                    # (measured: dp_loss 2.9e7 at step 0 on random init).
                    # Running stats then advance once per batch in this mode.
                    if getattr(model, "bn_mode", "batch") == "async":
                        dp_logits, _ = fwd(
                            model, new_params, state.batch_stats, img, True, rng_drop2
                        )
                    else:
                        dp_logits, new_stats = fwd(
                            model, new_params, new_stats, img, True, rng_drop2
                        )
                else:
                    dp_logits = logits
                dp_logits = jax.lax.stop_gradient(dp_logits)
                dp_loss, dp_grads = _dp_pass(dp_logits, mod, state.dp_params, idxs)
                metrics["dp_loss"] = dp_loss

        new_dp_params = state.dp_params
        new_dp_opt = state.dp_opt_state
        if use_dp and not config.override_embedding_weights:
            touched = jnp.zeros_like(state.dp_params, jnp.bool_).at[idxs].set(True)
            new_dp_params, new_dp_opt = sparse_adam_update(
                state.dp_params, dp_grads, state.dp_opt_state, touched, config.lr_inst_param
            )

        # Train dice vs the clean (augmented) label (reference :782-786);
        # one-hot-free formulation keeps the step HBM-light.
        pred = jnp.argmax(logits, axis=-1)
        nc = class_weights.shape[0]
        b_dice = dice_from_int_labels(pred, lbl, nc)

        metrics.update(ce_loss=ce_loss, dice=b_dice)
        metrics["loss"] = metrics.get("dp_loss", ce_loss)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            dp_params=new_dp_params,
            dp_opt_state=new_dp_opt,
        )
        return new_state, metrics

    return train_step


def _with_lr(opt_state, lr):
    """Set the injected learning rate on an optax.inject_hyperparams state."""
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hyper)


def make_eval_step(model, config: TrainConfig, num_classes: int,
                   eval_scale_factor: float = 2.0):
    """Validation forward on a full 3D sample at the reference's hard-coded
    x2.0 eval scale (`HybridIdLoader.py:336`, quirk documented in SURVEY.md
    §7). In 2D mode the volume is unstacked into slices along
    `use_2d_normal_to`, run through the 2D model, and restacked for 3D
    scoring (reference :897-910); scoring is always dice3d vs the clean label.
    """
    use_2d = config.use_2d_normal_to is not None

    @jax.jit
    def eval_step(state: DeepStapleState, batch):
        # batch holds full 3D volumes in both modes (reference get_3d_item).
        img, lbl = interpolate_sample(batch["image"], batch["label"], eval_scale_factor, False)
        if use_2d:
            from ..ops.stacking import make_2d_stack_from_3d, make_3d_from_2d_stack

            B = img.shape[0]
            stack = make_2d_stack_from_3d(img[:, None], config.use_2d_normal_to)[:, 0]
            logits, _ = _forward(
                model, state.params, state.batch_stats, stack, False,
                use_mind=config.use_mind, use_2d=True,
            )
            pred2d = jnp.argmax(logits, axis=-1)
            pred = make_3d_from_2d_stack(pred2d[:, None], config.use_2d_normal_to, B)[:, 0]
        else:
            logits, _ = _forward(
                model, state.params, state.batch_stats, img, False,
                use_mind=config.use_mind, use_2d=False,
            )
            pred = jnp.argmax(logits, axis=-1)
        b_dice = dice_from_int_labels(pred, lbl, num_classes)
        return pred, b_dice

    return eval_step
