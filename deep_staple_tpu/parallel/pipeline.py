"""Pipeline parallelism: GPipe over the model's natural 2-stage cut.

The reference is single-process single-GPU (`main_deep_staple.py:35`); at
1.2M params pipeline parallelism is never *required*. Like tensor
parallelism (parallel/tensor.py) it is implemented anyway so every SURVEY
§2.7 strategy is working, gate-tested code — and because the TPU-native
shape of it is instructive: JAX dispatch is asynchronous *per device*, so a
plain Python loop that alternates per-stage jitted calls on different
devices IS a pipeline schedule — stage 0 of microbatch i+1 runs concurrently
with stage 1 of microbatch i with no hand-written executor.

Two tiers live here: `GPipe2`, the minimal forward/backward runner (loss_fn
injected, plain optax update), and `make_pp_train_step`, the production
driver mode (`config.mesh_pipe_stages=2` / `--mesh-pipe-stages 2`) — the
FULL DeepSTAPLE train step (device-side augmentation, strict/fused OOL DP
schedule, SparseAdam DP update, per-stage optimizer-state slices) with the
same `(state, batch, lr, rng) -> (state, metrics)` contract as
`train/step.py::make_train_step`, gate-tested equal to it in f64.

Stage cut (the reference's own checkpoint segments,
`MobileNet_LR_ASPP_3D.py:206-232`):

  stage 0 (device 0): him (blocks 0-1) + lom (blocks 2-9)  — x -> (high, low)
  stage 1 (device 1): aspp + head + final f32 upsample     — (high, low) -> logits

Both stage modules reuse the production submodules under their production
names ("him"/"lom"/"aspp"/"head"), so stage variables are literally
key-slices of `MobileNetLRASPP3D` variables — no conversion, checkpoints
load directly (`split_variables`/`merge_variables`).

Backward runs GPipe-style with activation recomputation at the stage
boundary: only stage inputs are stored; stage 1 computes loss + grads
(w.r.t. its params AND its inputs) in one jit on device 1, the input
cotangents transfer back, and stage 0's jitted backward recomputes its
forward and applies the VJP on device 0. Per-microbatch gradients and
losses are averaged — for equal-size microbatches this equals sequential
gradient accumulation exactly (the gate in tests/test_parallel.py asserts
it against the unsplit model). BN batch_stats are ALSO returned as the mean
of the per-microbatch momentum updates; note this is parallel-accumulation
semantics (every microbatch updates from the same initial stats), not the
serially-threaded stats a sequential loop would produce.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..models.lraspp3d import (
    ASPP3D,
    BackboneHigh3D,
    BackboneLow3D,
    ConvHead3D,
    LRASPPHead3D,
)
from ..ops.resample import resize_nd

STAGE0_KEYS = ("him", "lom")
STAGE1_KEYS = ("aspp", "head")


class PipelineStage0(nn.Module):
    """him + lom under their production names (lraspp3d.py:396-397 glue)."""

    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None
    depthwise_impl: str = "auto"
    use_checkpointing: bool = False
    bn_mode: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        him_cls, lom_cls = BackboneHigh3D, BackboneLow3D
        if self.use_checkpointing:
            him_cls = nn.remat(him_cls, static_argnums=(2,))
            lom_cls = nn.remat(lom_cls, static_argnums=(2,))
        kw = dict(
            axis_name=self.axis_name, dtype=self.dtype,
            depthwise_impl=self.depthwise_impl, bn_mode=self.bn_mode,
        )
        x = x.astype(self.dtype or x.dtype)
        high = him_cls(**kw, name="him")(x, train)
        low = lom_cls(**kw, name="lom")(high, train)
        return high, low


class PipelineStage1(nn.Module):
    """aspp + head + final f32 upsample (lraspp3d.py:398-407 glue)."""

    num_classes: int
    out_spatial: tuple  # the ORIGINAL input spatial size (upsample target)
    head_type: str = "lraspp"
    dropout_rate: float = 0.5
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None
    use_checkpointing: bool = False
    bn_mode: str = "batch"

    @nn.compact
    def __call__(self, high, low, train: bool = False):
        aspp_cls = ASPP3D
        head_cls = LRASPPHead3D if self.head_type == "lraspp" else ConvHead3D
        if self.use_checkpointing:
            aspp_cls = nn.remat(aspp_cls, static_argnums=(2,))
            head_cls = nn.remat(head_cls, static_argnums=(3,))
        kw = dict(axis_name=self.axis_name, dtype=self.dtype, bn_mode=self.bn_mode)
        low = aspp_cls(dropout_rate=self.dropout_rate, **kw, name="aspp")(low, train)
        y = head_cls(num_classes=self.num_classes, **kw, name="head")(low, high, train)
        y = y.astype(jnp.float32)
        y = jnp.moveaxis(
            resize_nd(
                jnp.moveaxis(y, -1, 1), self.out_spatial,
                mode="linear", align_corners=False,
            ),
            1, -1,
        )
        return {"out": y}


_MODULE_KEYS = frozenset(STAGE0_KEYS + STAGE1_KEYS)


def _slice_opt_state(obj, keys):
    """Restrict every param-tree-structured dict inside an optax state to one
    stage's module keys ({'him','lom'} or {'aspp','head'}).

    Non-module leaves — step counts, injected hyperparameters — are shared
    verbatim by both stage copies: they start identical and element-wise
    optimizers (the AdamW family) advance them identically, so merging back
    can take either copy. Handles the nesting optax actually produces
    (NamedTuple states, plain dicts, tuples/lists of chained transforms)."""
    if isinstance(obj, dict):
        if obj and set(obj) <= _MODULE_KEYS:
            return {k: obj[k] for k in keys if k in obj}
        return {k: _slice_opt_state(v, keys) for k, v in obj.items()}
    if isinstance(obj, tuple):
        if hasattr(obj, "_fields"):  # NamedTuple (optax states)
            return type(obj)(*(_slice_opt_state(v, keys) for v in obj))
        return tuple(_slice_opt_state(v, keys) for v in obj)
    if isinstance(obj, list):
        return [_slice_opt_state(v, keys) for v in obj]
    return obj


def _merge_opt_state(a, b):
    """Inverse of _slice_opt_state: re-join two per-stage optax states into
    the unsplit state (module dicts union; shared scalars taken from stage 0
    — both copies advanced identically, see _slice_opt_state)."""
    if isinstance(a, dict) and isinstance(b, dict):
        if (a or b) and set(a) | set(b) <= _MODULE_KEYS and set(a).isdisjoint(b):
            return {**a, **b}
        return {k: _merge_opt_state(a[k], b[k]) for k in a}
    if isinstance(a, tuple) and hasattr(a, "_fields"):
        return type(a)(*(_merge_opt_state(x, y) for x, y in zip(a, b)))
    if isinstance(a, (tuple, list)):
        return type(a)(_merge_opt_state(x, y) for x, y in zip(a, b))
    return a


def split_variables(variables):
    """Slice full-model variables into (stage0_vars, stage1_vars) by key."""

    def pick(keys):
        out = {}
        for col, tree in variables.items():
            sub = {k: tree[k] for k in keys if k in tree}
            if sub:
                out[col] = sub
        return out

    return pick(STAGE0_KEYS), pick(STAGE1_KEYS)


def merge_variables(v0, v1):
    """Inverse of split_variables (e.g. to save a checkpoint after PP steps)."""
    cols = set(v0) | set(v1)
    return {c: {**v0.get(c, {}), **v1.get(c, {})} for c in cols}


class GPipe2:
    """Two-stage GPipe runner for MobileNetLRASPP3D.

    devices: two jax devices (stage i pinned to devices[i]); the Python
    microbatch loop exploits per-device async dispatch for overlap.
    loss_fn(logits, labels) -> scalar, averaged over microbatches.
    """

    def __init__(self, model, loss_fn: Callable, in_spatial, devices=None):
        devices = devices if devices is not None else jax.devices()
        if len(devices) < 2:
            raise ValueError("GPipe2 needs at least 2 devices")
        self.d0, self.d1 = devices[0], devices[1]
        self.loss_fn = loss_fn
        self._bn_semantics_warned = False
        bn_mode = getattr(model, "bn_mode", "batch")
        self.stage0 = PipelineStage0(
            dtype=model.dtype, axis_name=model.axis_name,
            depthwise_impl=model.depthwise_impl,
            use_checkpointing=model.use_checkpointing,
            bn_mode=bn_mode,
        )
        self.stage1 = PipelineStage1(
            num_classes=model.num_classes, out_spatial=tuple(in_spatial),
            head_type=model.head_type, dropout_rate=model.dropout_rate,
            dtype=model.dtype, axis_name=model.axis_name,
            use_checkpointing=model.use_checkpointing,
            bn_mode=bn_mode,
        )

        def fwd0(v0, x):
            return self.stage0.apply(v0, x, True, mutable=["batch_stats"])

        def loss1(p1, rest1, high, low, labels, rng):
            out, mut = self.stage1.apply(
                {"params": p1, **rest1}, high, low, True,
                rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            return self.loss_fn(out["out"], labels), mut

        def fwdbwd1(v1, high, low, labels, rng):
            rest1 = {k: v for k, v in v1.items() if k != "params"}
            (loss, mut), grads = jax.value_and_grad(
                loss1, argnums=(0, 2, 3), has_aux=True
            )(v1["params"], rest1, high, low, labels, rng)
            g1, g_high, g_low = grads
            return loss, g1, (g_high, g_low), mut

        def bwd0(v0, x, cotangents):
            # GPipe activation recomputation: re-run stage 0's forward under
            # vjp; only the stage INPUT was stored between phases.
            rest0 = {k: v for k, v in v0.items() if k != "params"}

            def f(p0):
                (high, low), mut = self.stage0.apply(
                    {"params": p0, **rest0}, x, True, mutable=["batch_stats"]
                )
                return (high, low), mut

            _, vjp, mut = jax.vjp(f, v0["params"], has_aux=True)
            (g0,) = vjp(cotangents)
            return g0, mut

        # Stage placement comes from the COMMITTED inputs (stage variables
        # are device_put to their stage device; jit runs where its committed
        # args live) — no per-jit device pinning needed.
        self.fwd0 = jax.jit(fwd0)
        self.bwd0 = jax.jit(bwd0)
        self.fwdbwd1 = jax.jit(fwdbwd1)

    def place_variables(self, variables):
        """Split full-model variables and pin each stage to its device."""
        v0, v1 = split_variables(variables)
        return (
            jax.device_put(v0, self.d0),
            jax.device_put(v1, self.d1),
        )

    def loss_and_grads(self, v0, v1, x, labels, rng, n_micro: int):
        """Pipelined fwd+bwd over n_micro microbatches.

        Returns (loss, (g0, g1), (new_bs0, new_bs1)) — every quantity the
        mean over microbatches; loss and grads equal sequential gradient
        accumulation (batch_stats are parallel-accumulation means, see the
        module docstring). The loop body only *dispatches*: stage-0
        forwards of later microbatches execute on device 0 while device 1
        runs stage-1 fwd+bwd of earlier ones.
        """
        B = x.shape[0]
        if B % n_micro:
            raise ValueError(f"batch {B} not divisible by {n_micro} microbatches")
        if n_micro > 1 and not self._bn_semantics_warned:
            # The one semantics difference vs the unsplit model — and it only
            # exists with real microbatching (n_micro=1 IS the sequential
            # loop), so warn here rather than at construction.
            import warnings

            warnings.warn(
                "GPipe2: with n_micro > 1, BatchNorm batch_stats follow "
                "parallel-accumulation semantics (each microbatch updates "
                "from the same initial stats, then the momentum updates are "
                "averaged) — NOT the serially-threaded stats of a sequential "
                "loop. Param gradients are exact. See the module docstring.",
                stacklevel=2,
            )
            self._bn_semantics_warned = True
        m = B // n_micro
        xs = [jax.device_put(x[i * m:(i + 1) * m], self.d0) for i in range(n_micro)]
        ys = [jax.device_put(labels[i * m:(i + 1) * m], self.d1) for i in range(n_micro)]
        rngs = jax.random.split(rng, n_micro)

        # Fill: dispatch every stage-0 forward (device 0 queue).
        f0_out = [self.fwd0(v0, xi) for xi in xs]
        losses, g1s, bs1s, g0s, bs0s = [], [], [], [], []
        for i in range(n_micro):
            (high, low), _ = f0_out[i]
            f0_out[i] = None  # release the boundary pair once transferred:
            # device-0 residency stays O(1) microbatches, not O(n_micro)
            high1 = jax.device_put(high, self.d1)
            low1 = jax.device_put(low, self.d1)
            loss, g1, cot, mut1 = self.fwdbwd1(v1, high1, low1, ys[i], rngs[i])
            cot0 = jax.device_put(cot, self.d0)
            g0, mut0 = self.bwd0(v0, xs[i], cot0)
            losses.append(loss)
            g1s.append(g1)
            bs1s.append(mut1["batch_stats"])
            g0s.append(g0)
            bs0s.append(mut0["batch_stats"])

        mean = lambda ts: jax.tree_util.tree_map(lambda *a: sum(a) / n_micro, *ts)
        return (
            sum(jax.device_get(l) for l in losses) / n_micro,
            (mean(g0s), mean(g1s)),
            (mean(bs0s), mean(bs1s)),
        )

    def init_optimizer(self, tx, v0, v1):
        """Per-stage optimizer states, each resident on its stage's device.

        Element-wise optax transforms (Adam/AdamW family) update each leaf
        independently, so running the SAME tx per stage subtree is exactly
        the update the unsplit model would take — no cross-stage coupling
        exists to lose."""
        self._tx = tx
        self._upd = jax.jit(lambda g, s, p: tx.update(g, s, p))
        self._apply = jax.jit(
            lambda p, u: jax.tree_util.tree_map(lambda a, b: a + b, p, u)
        )
        return (
            jax.device_put(tx.init(v0["params"]), self.d0),
            jax.device_put(tx.init(v1["params"]), self.d1),
        )

    def train_step(self, v0, v1, opt0, opt1, x, labels, rng, n_micro: int):
        """One pipelined training step: GPipe fwd/bwd then per-stage
        optimizer updates, every piece of state staying on its stage device.

        Returns (loss, new_v0, new_v1, new_opt0, new_opt1). Param updates
        equal a sequential-accumulation step on the unsplit model (the
        optimizer is element-wise); batch_stats adopt the
        parallel-accumulation means (module docstring)."""
        if not hasattr(self, "_tx"):
            raise RuntimeError("call init_optimizer(tx, v0, v1) first")
        loss, (g0, g1), (bs0, bs1) = self.loss_and_grads(
            v0, v1, x, labels, rng, n_micro
        )
        u0, opt0 = self._upd(g0, opt0, v0["params"])
        p0 = self._apply(v0["params"], u0)
        u1, opt1 = self._upd(g1, opt1, v1["params"])
        p1 = self._apply(v1["params"], u1)
        new_v0 = {**v0, "params": p0, "batch_stats": bs0}
        new_v1 = {**v1, "params": p1, "batch_stats": bs1}
        return loss, new_v0, new_v1, opt0, opt1


def make_pp_train_step(model, tx, config, class_weights, fixed_weighting,
                       augment_params=None,
                       pre_interpolation_factor: float = 1.5,
                       augment: bool = True, n_micro: int = 1, devices=None):
    """Pipelined 2-stage drop-in for `train/step.py::make_train_step`.

    Same call contract — ``step(state, batch, lr, rng) -> (new_state,
    metrics)`` on the plain DeepStapleState — but the model forward/backward
    runs as GPipe across two devices along the reference's own
    checkpoint-segment cut (`MobileNet_LR_ASPP_3D.py:206-232`): stage 0
    (augmentation + him + lom) on ``devices[0]``, stage 1 (aspp + head +
    final upsample + every loss) on ``devices[1]``, with activation
    recomputation at the boundary (only stage inputs are stored). This is
    `config.mesh_pipe_stages=2` in the production driver.

    Exactness vs the fused single-device step (gate: f64 equivalence in
    tests/test_parallel.py):

      * ``n_micro=1``: EXACT — same augmentation rng, same dropout rng fold
        (stage modules reuse the production submodule names, so flax's
        path-folded dropout streams coincide), same BN batch statistics,
        same AdamW update (element-wise, so the stage split cannot change
        it), same strict/fused OOL DP schedule.
      * ``n_micro>1``: CE loss/gradients still accumulate EXACTLY — the
        class-weighted CE denominator ``sum(w[label])`` depends only on the
        labels, so each microbatch contributes ``grad(num_mb)/D_global`` and
        the sum over microbatches is the full-batch gradient. The DP pass is
        exact too: its batch-mean weight normalization does NOT decompose
        over microbatches (`losses.py::dp_weights_from_params`), so it runs
        over the FULL batch on stage 1, where all the logits already live.
        Only BatchNorm batch statistics become per-microbatch
        (parallel-accumulation means — the standard GPipe semantics; see
        the module docstring) and per-microbatch dropout masks are drawn.

    The non-OOL DP mode is rejected: there the batch-coupled DP loss
    backprops into the model, which does not decompose over microbatches
    (config.__post_init__ enforces this too).
    """
    from functools import partial, reduce

    from ..core.config import DataParamMode
    from ..ops.augment import AugmentParams, augment_sample_pair
    from ..ops.dice import dice_from_int_labels
    from ..train import losses as _losses
    from ..train.optim import sparse_adam_update
    from ..train.step import _featurize

    if augment_params is None:
        augment_params = AugmentParams()
    use_dp = config.data_param_mode == DataParamMode.INSTANCE_PARAMS
    if config.use_2d_normal_to is not None:
        raise ValueError("pipeline parallelism supports the 3D model only")
    if use_dp and not config.use_ool_dp_loss:
        raise ValueError(
            "pipeline parallelism requires use_ool_dp_loss=True (the non-OOL "
            "DP loss backprops its batch-coupled weight normalization into "
            "the model, which does not decompose over microbatches)"
        )
    devices = devices if devices is not None else jax.devices()
    if len(devices) < 2:
        raise ValueError("mesh_pipe_stages=2 needs at least 2 devices")
    d0, d1 = devices[0], devices[1]

    class_weights = jnp.asarray(class_weights, jnp.float32)
    fixed_weighting = jnp.asarray(fixed_weighting, jnp.float32)
    nc = int(class_weights.shape[0])
    bn_mode = getattr(model, "bn_mode", "batch")
    use_mind = config.use_mind

    stage0 = PipelineStage0(
        dtype=model.dtype, axis_name=model.axis_name,
        depthwise_impl=model.depthwise_impl,
        use_checkpointing=model.use_checkpointing, bn_mode=bn_mode,
    )
    _stage1_cache = {}

    def _stage1(out_spatial):
        if out_spatial not in _stage1_cache:
            _stage1_cache[out_spatial] = PipelineStage1(
                num_classes=model.num_classes, out_spatial=out_spatial,
                head_type=model.head_type, dropout_rate=model.dropout_rate,
                dtype=model.dtype, axis_name=model.axis_name,
                use_checkpointing=model.use_checkpointing, bn_mode=bn_mode,
            )
        return _stage1_cache[out_spatial]

    def _wsel(targets):
        # select-sum weight lookup (losses.py::weighted_cross_entropy).
        w = 0.0
        for c in range(nc):
            w = w + class_weights[c] * (targets == c)
        return w

    @jax.jit
    def _prepare(img, lbl, mod, rng):
        if augment:
            img, lbl, mod, _ = augment_sample_pair(
                rng, img, lbl, mod, params=augment_params,
                pre_interpolation_factor=pre_interpolation_factor,
                use_2d=False, order=config.augment_order, mesh=None,
            )
        return img, lbl, mod

    @jax.jit
    def _ce_denom(mod):
        return jnp.sum(_wsel(mod))

    @jax.jit
    def fwd0(v0, img):
        x = _featurize(img, use_mind, False)
        (high, low), mut = stage0.apply(v0, x, True, mutable=["batch_stats"])
        return (high, low), mut["batch_stats"]

    @partial(jax.jit, static_argnums=(0,))
    def fwdbwd1(stage1, v1, high, low, mod_mb, denom, rng_drop):
        rest1 = {k: v for k, v in v1.items() if k != "params"}

        def f(p1, h, l):
            out, mut = stage1.apply(
                {"params": p1, **rest1}, h, l, True,
                rngs={"dropout": rng_drop}, mutable=["batch_stats"],
            )
            logits = out["out"]
            nll = _losses._nll(logits, mod_mb)
            # microbatch CE contribution with the GLOBAL denominator:
            # summing these over microbatches is the full-batch weighted CE
            # (and the same holds for its gradients).
            loss_mb = jnp.sum(nll * _wsel(mod_mb)) / denom
            return loss_mb, (logits, mut["batch_stats"])

        (loss_mb, (logits, bs1)), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2), has_aux=True
        )(v1["params"], high, low)
        g1, g_high, g_low = grads
        return loss_mb, logits, bs1, g1, (g_high, g_low)

    @jax.jit
    def bwd0(v0, img, cotangents):
        # GPipe activation recomputation: re-run stage 0's forward under vjp.
        rest0 = {k: v for k, v in v0.items() if k != "params"}

        def f(p0):
            x = _featurize(img, use_mind, False)
            (high, low), mut = stage0.apply(
                {"params": p0, **rest0}, x, True, mutable=["batch_stats"]
            )
            return (high, low), mut

        _, vjp, _ = jax.vjp(f, v0["params"], has_aux=True)
        (g0,) = vjp(cotangents)
        return g0

    @partial(jax.jit, static_argnums=(0,))
    def fwd1_logits(stage1, v1, high, low, rng_drop):
        out, mut = stage1.apply(
            v1, high, low, True, rngs={"dropout": rng_drop},
            mutable=["batch_stats"],
        )
        return out["out"], mut["batch_stats"]

    @jax.jit
    def _upd(g, opt_s, p, lr):
        hyper = dict(opt_s.hyperparams)
        hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
        opt_s = opt_s._replace(hyperparams=hyper)
        u, new_s = tx.update(g, opt_s, p)
        return jax.tree.map(lambda a, b: a + b, p, u), new_s

    @jax.jit
    def _sum_trees(ts):
        return jax.tree.map(lambda *a: reduce(jnp.add, a), *ts)

    @jax.jit
    def _mean_trees(ts):
        return jax.tree.map(lambda *a: reduce(jnp.add, a) / len(a), *ts)

    @jax.jit
    def _dp_tail(dp_logits_mbs, mod, dp_params, dp_opt, idxs):
        dp_logits = jax.lax.stop_gradient(jnp.concatenate(list(dp_logits_mbs), 0))

        def dp_objective(dp_vec):
            bare = dp_vec[idxs]
            fixed = fixed_weighting[idxs] if config.use_fixed_weighting else None
            return _losses.dp_loss_fn(
                dp_logits, mod, bare, fixed,
                use_risk_regularization=config.use_risk_regularization,
            )

        dp_loss, dp_grads = jax.value_and_grad(dp_objective)(dp_params)
        if config.override_embedding_weights:
            return dp_loss, dp_params, dp_opt
        touched = jnp.zeros_like(dp_params, jnp.bool_).at[idxs].set(True)
        new_dp, new_opt = sparse_adam_update(
            dp_params, dp_grads, dp_opt, touched, config.lr_inst_param
        )
        return dp_loss, new_dp, new_opt

    @jax.jit
    def _dice_tail(logits_mbs, lbl):
        pred = jnp.argmax(jnp.concatenate(list(logits_mbs), 0), axis=-1)
        return dice_from_int_labels(pred, lbl, nc)

    @jax.jit
    def _sum_scalars(xs):
        return reduce(jnp.add, xs)

    def pp_train_step(state, batch, lr, rng):
        v0, v1 = split_variables(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        # device_put is a no-op for leaves already resident: after step 1 the
        # stage trees live on their devices and stay there across steps.
        v0 = jax.device_put(v0, d0)
        v1 = jax.device_put(v1, d1)
        opt0 = jax.device_put(_slice_opt_state(state.opt_state, STAGE0_KEYS), d0)
        opt1 = jax.device_put(_slice_opt_state(state.opt_state, STAGE1_KEYS), d1)

        rng_aug, rng_drop, rng_drop2 = jax.random.split(rng, 3)
        img = jax.device_put(jnp.asarray(batch["image"]), d0)
        lbl = jax.device_put(jnp.asarray(batch["label"]), d0)
        mod = jax.device_put(jnp.asarray(batch["modified_label"]), d0)
        img, lbl, mod = _prepare(img, lbl, mod, rng_aug)

        B = img.shape[0]
        if B % n_micro:
            raise ValueError(f"batch {B} not divisible by {n_micro} microbatches")
        m = B // n_micro
        stage1 = _stage1(tuple(img.shape[1:4]))
        denom = jax.device_put(_ce_denom(mod), d1)
        mod1 = jax.device_put(mod, d1)
        lbl1 = jax.device_put(lbl, d1)
        # n_micro=1 keeps the fused step's EXACT rng streams.
        drops = jax.random.split(rng_drop, n_micro) if n_micro > 1 else [rng_drop]
        drops2 = jax.random.split(rng_drop2, n_micro) if n_micro > 1 else [rng_drop2]

        # ---- GPipe fwd+bwd: fill device 0's queue, then drain through
        # device 1 — per-device async dispatch IS the pipeline schedule. ----
        f0 = [fwd0(v0, img[i * m:(i + 1) * m]) for i in range(n_micro)]
        losses_mb, logits_mb = [], []
        g0s, g1s, bs0s, bs1s = [], [], [], []
        for i in range(n_micro):
            (high, low), bs0_i = f0[i]
            f0[i] = None  # O(1)-microbatch boundary residency (GPipe2 note)
            loss_mb, logits, bs1_i, g1, cot = fwdbwd1(
                stage1, v1,
                jax.device_put(high, d1), jax.device_put(low, d1),
                mod1[i * m:(i + 1) * m], denom, drops[i],
            )
            g0 = bwd0(v0, img[i * m:(i + 1) * m], jax.device_put(cot, d0))
            losses_mb.append(loss_mb)
            logits_mb.append(logits)
            g0s.append(g0)
            g1s.append(g1)
            bs0s.append(bs0_i)
            bs1s.append(bs1_i)

        if n_micro == 1:
            g0, g1, bs0, bs1 = g0s[0], g1s[0], bs0s[0], bs1s[0]
            ce_loss = losses_mb[0]
        else:
            g0 = _sum_trees(tuple(g0s))       # grads: exact sum (global denom)
            g1 = _sum_trees(tuple(g1s))
            bs0 = _mean_trees(tuple(bs0s))    # BN stats: GPipe parallel means
            bs1 = _mean_trees(tuple(bs1s))
            ce_loss = _sum_scalars(tuple(losses_mb))

        new_p0, new_opt0 = _upd(g0, opt0, v0["params"], lr)
        new_p1, new_opt1 = _upd(g1, opt1, v1["params"], lr)

        metrics = {}
        new_dp_params, new_dp_opt = state.dp_params, state.dp_opt_state
        if use_dp:
            if config.ool_mode == "strict":
                # Second pipelined forward with the UPDATED params
                # (train/step.py strict-OOL semantics, incl. the async-BN
                # step-start-stats rule).
                if bn_mode == "async":
                    bs_in0, bs_in1 = v0["batch_stats"], v1["batch_stats"]
                else:
                    bs_in0, bs_in1 = bs0, bs1
                nv0 = {**v0, "params": new_p0, "batch_stats": bs_in0}
                nv1 = {**v1, "params": new_p1, "batch_stats": bs_in1}
                f0b = [fwd0(nv0, img[i * m:(i + 1) * m]) for i in range(n_micro)]
                dp_logits_mb, bs0b, bs1b = [], [], []
                for i in range(n_micro):
                    (high, low), b0 = f0b[i]
                    f0b[i] = None
                    logits2, b1 = fwd1_logits(
                        stage1, nv1,
                        jax.device_put(high, d1), jax.device_put(low, d1),
                        drops2[i],
                    )
                    dp_logits_mb.append(logits2)
                    bs0b.append(b0)
                    bs1b.append(b1)
                if bn_mode != "async":
                    # running stats advance twice per batch, like the fused
                    # strict step; async keeps FWD#1's stats (advance once).
                    bs0 = bs0b[0] if n_micro == 1 else _mean_trees(tuple(bs0b))
                    bs1 = bs1b[0] if n_micro == 1 else _mean_trees(tuple(bs1b))
            else:
                dp_logits_mb = logits_mb
            dp_params1 = jax.device_put(state.dp_params, d1)
            dp_opt1 = jax.device_put(state.dp_opt_state, d1)
            idxs1 = jax.device_put(jnp.asarray(batch["dataset_idx"]), d1)
            dp_loss, new_dp_params, new_dp_opt = _dp_tail(
                tuple(dp_logits_mb), mod1, dp_params1, dp_opt1, idxs1
            )
            metrics["dp_loss"] = dp_loss

        b_dice = _dice_tail(tuple(logits_mb), lbl1)
        metrics.update(ce_loss=ce_loss, dice=b_dice)
        metrics["loss"] = metrics.get("dp_loss", ce_loss)

        new_state = state.replace(
            step=state.step + 1,
            params=merge_variables({"params": new_p0}, {"params": new_p1})["params"],
            batch_stats=merge_variables(
                {"batch_stats": bs0}, {"batch_stats": bs1}
            )["batch_stats"],
            opt_state=_merge_opt_state(new_opt0, new_opt1),
            dp_params=new_dp_params,
            dp_opt_state=new_dp_opt,
        )
        return new_state, metrics

    return pp_train_step
