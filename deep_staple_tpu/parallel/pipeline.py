"""Pipeline parallelism: GPipe over the model's natural 2-stage cut.

The reference is single-process single-GPU (`main_deep_staple.py:35`); at
1.2M params pipeline parallelism is never *required*. Like tensor
parallelism (parallel/tensor.py) it is implemented anyway so every SURVEY
§2.7 strategy is working, gate-tested code — and because the TPU-native
shape of it is instructive: JAX dispatch is asynchronous *per device*, so a
plain Python loop that alternates per-stage jitted calls on different
devices IS a pipeline schedule — stage 0 of microbatch i+1 runs concurrently
with stage 1 of microbatch i with no hand-written executor.

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
