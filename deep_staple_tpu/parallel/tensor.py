"""Tensor parallelism: channel-sharded convolutions over a ('model',) axis.

The reference is single-process single-GPU (`CUDA_VISIBLE_DEVICES='0'`,
`main_deep_staple.py:35`); at 1.2M params tensor parallelism is never
*required* for memory. It is implemented anyway so every §2.7 strategy is a
working, gate-tested code path rather than a documented N/A — and because on
TPU it costs almost nothing to express: TP here is pure GSPMD annotation (no
model surgery, no hand-written collectives), the idiomatic JAX way.

Megatron-style column/row pairing per inverted-residual block
(`MobileNet_LR_ASPP_3D.py:141-154` structure):

  * expand 1x1 conv      — COLUMN: output channels sharded over 'model';
  * depthwise 3x3x3 conv — per-channel, so it inherits the column sharding
                           (kernel (k,k,k,1,C) sharded on C; zero comm);
  * project 1x1 conv     — ROW: the contraction dim (mid channels) sharded;
                           XLA inserts the psum that completes the matmul;
  * BatchNorm            — per-channel statistics: shards with column
                           activations, replicated after row projections.

ASPP (`:86-114`): every branch conv is COLUMN, the post-concat projection is
ROW. LR-ASPP head (`:21-53`): cbr + scale convs COLUMN, the high classifier
ROW, the low classifier replicated (num_classes is tiny).

The same path rules map onto the optimizer state automatically: optax's
adam mu/nu subtrees mirror the param tree, so their leaves carry the same
trailing module path and receive the same shardings — the optimizer update
then runs fully sharded without any extra wiring.

Dims that don't divide the axis size fall back to replicated, so any
`model` axis size that divides 32 (the narrowest mid width) works.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, FlattenedIndexKey, GetAttrKey, SequenceKey

_COLUMN, _ROW, _REPL = "column", "row", "repl"


def _key_name(k) -> str:
    if isinstance(k, DictKey):
        return str(k.key)
    if isinstance(k, GetAttrKey):
        return str(k.name)
    if isinstance(k, SequenceKey):
        return str(k.idx)
    if isinstance(k, FlattenedIndexKey):
        return str(k.key)
    return str(k)


def _conv_scope_role(names: tuple[str, ...]) -> str:
    """COLUMN/ROW/replicated role of the conv scope owning a leaf.

    Works on any tree whose leaf paths END with the flax module path
    (params, batch_stats, and optax mu/nu mirrors alike).
    """
    for i, n in enumerate(names):
        if n.startswith("ConvBN_"):
            parent = names[i - 1] if i > 0 else ""
            try:
                idx = int(n.split("_", 1)[1])
            except ValueError:
                return _REPL
            if parent.startswith("InvertedResidual3D"):
                return _ROW if idx == 2 else _COLUMN
            if parent == "aspp":
                # branches 0-5 (1x1, four rates, pool) COLUMN; the
                # post-concat projection ConvBN_6 ROW.
                return _ROW if idx == 6 else _COLUMN
            if parent == "head":
                return _COLUMN if idx == 0 else _REPL
            return _REPL
    if "head" in names:
        nxt_i = names.index("head") + 1
        nxt = names[nxt_i] if nxt_i < len(names) else ""
        if nxt == "Conv_0":  # the sigmoid-gate 'scale' conv (16 -> 128)
            return _COLUMN
        if nxt == "Conv_2":  # high classifier (128 -> num_classes)
            return _ROW
    return _REPL


_BN_LEAVES = ("scale", "bias", "mean", "var")


def _leaf_spec(names: tuple[str, ...], shape, size: int, axis: str) -> P:
    role = _conv_scope_role(names)
    leaf = names[-1] if names else ""
    if role == _COLUMN:
        if leaf == "kernel" and len(shape) == 5 and shape[4] % size == 0:
            return P(None, None, None, None, axis)
        if leaf in _BN_LEAVES and len(shape) == 1 and shape[0] % size == 0:
            return P(axis)
    elif role == _ROW:
        # Only the kernel's contraction dim shards; bias (added once, after
        # the psum) and the following BatchNorm stay replicated.
        if leaf == "kernel" and len(shape) == 5 and shape[3] % size == 0:
            return P(None, None, None, axis, None)
    return P()


def tp_shardings(tree, mesh: Mesh, axis: str = "model"):
    """NamedSharding tree for any state/variables pytree.

    Conv kernels + their BN vectors get the column/row specs above; every
    other leaf (DP vector, counters, non-3D-model params) is replicated.
    Apply with `jax.device_put(tree, tp_shardings(tree, mesh))`.
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no {axis!r} axis (axes: {mesh.axis_names})")
    size = mesh.shape[axis]

    def one(path, leaf):
        names = tuple(_key_name(k) for k in path)
        return NamedSharding(mesh, _leaf_spec(names, np.shape(leaf), size, axis))

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_tp(tree, mesh: Mesh, axis: str = "model"):
    """device_put the tree with tensor-parallel shardings."""
    return jax.device_put(tree, tp_shardings(tree, mesh, axis))


def count_sharded_leaves(tree, mesh: Mesh, axis: str = "model") -> int:
    """How many leaves actually shard over `axis` (anti-vacuity helper for
    tests and the dryrun: >0 proves the annotations hit the model)."""
    shardings = jax.tree_util.tree_leaves(tp_shardings(tree, mesh, axis))
    return sum(1 for s in shardings if axis in jax.tree_util.tree_leaves(tuple(s.spec)))
