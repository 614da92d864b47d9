"""Async (one-step-stale) BatchNorm — a TPU memory-bandwidth lever.

Exact BatchNorm in train mode creates a sequential dependency on every conv
output y: stats(y) must finish before normalize(y) can start, so XLA must
schedule (at least) two full HBM read passes over y plus the normalized
write. Measured consequence: the model stages run AT the per-op tiled-layout
HBM floor (benchmarks/roofline.py: lom 327 ms, him 103 ms fwd+bwd at bench
scale), and the BN stats/normalize passes are a large share of those bytes.

`AsyncBatchNorm` breaks the dependency: it NORMALIZES with the running
statistics (stop-gradient constants known before the conv runs) while still
UPDATING the running statistics from the current batch. The stats reduction
and the normalize+activation epilogue then both read y with no ordering
between them, so XLA can multi-output-fuse them into a single pass; the
backward also loses the batch-stat coupling terms (the d-mean/d-var
broadcasts), keeping only the per-channel scale/bias grad reductions.

Semantics: identical update rule to `nn.BatchNorm` (momentum ra update from
biased batch variance, optional `axis_name` cross-device stats) except
  * normalization uses the running stats as of the PREVIOUS step (one-step
    stale; with momentum 0.9 the stats trail a few dozen steps like the
    reference's running stats already do);
  * the FIRST update seeds the running stats directly with the first batch's
    statistics (momentum 0 once, tracked by a 'count' scalar in the
    batch_stats collection) instead of drifting from the (0, 1) init over
    ~1/(1-momentum) steps. Step 0 itself normalizes through the (0, 1) init,
    i.e. the scale/bias affine only.
  * eval mode (`use_running_average=True`) is exactly `nn.BatchNorm` eval.

This is a 'fast'-preset tradeoff in the same spirit as the int6 fused warp:
the DP-recovery oracle gates it (tests/test_disturbance_recovery.py) and the
strict parity preset keeps exact BN. Drop-in param-compatible with
`nn.BatchNorm` (same 'scale'/'bias' params, same 'mean'/'var' running stats
plus the extra 'count' scalar) — instantiate with name="BatchNorm_0" to keep
checkpoint paths identical.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["AsyncBatchNorm", "SlabBatchNorm"]


class AsyncBatchNorm(nn.Module):
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        count = self.variable(
            "batch_stats", "count", lambda: jnp.zeros((), jnp.int32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        # Normalize with the running stats (constants w.r.t. this step's
        # data): y = x * mul + add, one fused elementwise pass.
        mean = jax.lax.stop_gradient(ra_mean.value)
        var = jax.lax.stop_gradient(ra_var.value)
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        add = bias - mean * mul
        out_dtype = self.dtype or x.dtype
        y = x.astype(out_dtype) * mul.astype(out_dtype) + add.astype(out_dtype)

        if (
            not self.use_running_average
            and not self.is_initializing()
            and self.is_mutable_collection("batch_stats")
        ):
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            b_mean = jnp.mean(xf, axes)
            b_mean2 = jnp.mean(jnp.square(xf), axes)
            if self.axis_name is not None:
                b_mean, b_mean2 = jax.lax.pmean(
                    (b_mean, b_mean2), axis_name=self.axis_name
                )
            b_var = b_mean2 - jnp.square(b_mean)
            # First update seeds directly (momentum 0 once).
            m = jnp.where(count.value == 0, 0.0, self.momentum)
            ra_mean.value = m * ra_mean.value + (1.0 - m) * b_mean
            ra_var.value = m * ra_var.value + (1.0 - m) * b_var
            count.value = count.value + 1
        return y


class SlabBatchNorm(nn.Module):
    """Same-batch BatchNorm with the statistics reduction restricted to a
    D-strided slab subsample — the STABLE member of the bandwidth-lever
    family (see module docstring above for the HBM accounting).

    Exact train-mode BN moves ~3 passes of each conv output y through HBM
    (stats read, normalize read, normalized write, on top of the conv's own
    write). `AsyncBatchNorm` gets that to ~2 by normalizing through stale
    running stats, but stale stats amplify parameter jumps through
    low-variance channels (measured: a 2e8 loss transient at step 1 under
    AdamW in tests/test_norm.py's toy). SlabBatchNorm instead keeps the
    stats CURRENT — so normalization is self-consistent with this batch and
    there is no staleness transient at all — and shrinks the stats pass to
    `1/stride` of the volume by striding the leading spatial axis (D of
    NDHWC). Slabs along D are whole (8,128) tiles on TPU, so the strided
    read saves real bandwidth (a lane/sublane-strided read would not).
    Total ≈ 2 + 1/stride passes vs exact BN's 3.

    Statistics quality: per-channel mean/var over B x ceil(D/stride) x H x W
    voxels — at production bench scale (8, 96, 96, 38) stride 4 that is
    ~2.8M samples/channel, i.e. estimator noise orders below the batch-to-
    batch variation BN already tolerates. Tensors whose D is smaller than
    `stride` (the ASPP pooled branch's 1x1x1) fall back to full stats.

    `stop_grad_stats=True` (default) treats mean/var as constants in the
    backward (drops BN's batch-coupling terms, like AsyncBatchNorm's
    backward), which keeps the bwd an elementwise epilogue. Both settings
    converge in the toy gate (tests/test_norm.py).

    Running stats: identical nn.BatchNorm blend of the slab statistics, with
    the same first-step seeding + 'count' scalar as AsyncBatchNorm; eval
    mode (`use_running_average=True`) is exactly nn.BatchNorm eval.
    Param/stat-path drop-in with nn.BatchNorm (+ 'count').
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    stride: int = 4
    stop_grad_stats: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        count = self.variable(
            "batch_stats", "count", lambda: jnp.zeros((), jnp.int32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if self.use_running_average:
            mean = ra_mean.value
            var = ra_var.value
        else:
            # Slab subsample along the leading spatial axis (dim 1 of NDHWC);
            # full stats for rank-4 (2D) inputs or tiny-D tensors.
            if x.ndim == 5 and x.shape[1] >= self.stride:
                xs = x[:, :: self.stride]
            else:
                xs = x
            xf = xs.astype(jnp.float32)
            axes = tuple(range(xf.ndim - 1))
            mean = jnp.mean(xf, axes)
            mean2 = jnp.mean(jnp.square(xf), axes)
            if self.axis_name is not None:
                mean, mean2 = jax.lax.pmean((mean, mean2), axis_name=self.axis_name)
            var = mean2 - jnp.square(mean)
            if self.stop_grad_stats:
                mean = jax.lax.stop_gradient(mean)
                var = jax.lax.stop_gradient(var)
            if not self.is_initializing() and self.is_mutable_collection("batch_stats"):
                m = jnp.where(count.value == 0, 0.0, self.momentum)
                sg = jax.lax.stop_gradient
                ra_mean.value = m * ra_mean.value + (1.0 - m) * sg(mean)
                ra_var.value = m * ra_var.value + (1.0 - m) * sg(var)
                count.value = count.value + 1

        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        add = bias - mean * mul
        out_dtype = self.dtype or x.dtype
        return x.astype(out_dtype) * mul.astype(out_dtype) + add.astype(out_dtype)
