"""Device mesh + sharding helpers.

The reference is single-process single-GPU (`CUDA_VISIBLE_DEVICES='0'`,
`main_deep_staple.py:35`) with no distributed backend (SURVEY.md §2.7). The
TPU framework scales through GSPMD: batches are sharded over a ('data',) mesh
axis and the jitted train step runs unchanged — XLA inserts the collectives
(gradient psum, BN-stat all-reduce, DP scatter-add psum) over ICI.

Axes:
  data  — data parallelism (batch axis).
  space — spatial sharding of the volume H axis (dim 2 of B,D,H,W) for whole-volume work
          (halo-exchanged convs; see parallel/spatial.py).
  model — tensor parallelism (conv channel sharding; see parallel/tensor.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, space: int = 1, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if data is None:
        data = len(devices) // (space * model)
    devs = np.asarray(devices[: data * space * model]).reshape(data, space, model)
    return Mesh(devs, axis_names=("data", "space", "model"))


def batch_sharding(mesh: Mesh, spatial_axis: bool = False) -> NamedSharding:
    """Batch dim over 'data'; optionally the H axis (dim 2 of B,D,H,W) over
    'space' for whole-volume training."""
    if spatial_axis:
        return NamedSharding(mesh, P("data", None, "space"))
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: dict, mesh: Mesh, spatial_axis: bool = False) -> dict:
    """Shard every batch array: dim 0 over 'data', volumes optionally H over
    'space' (scalars/per-sample vectors stay data-sharded only)."""
    out = {}
    for k, v in batch.items():
        sh = batch_sharding(mesh, spatial_axis and getattr(v, "ndim", 1) >= 3)
        out[k] = jax.device_put(v, sh)
    return out


def replicate_state(state, mesh: Mesh):
    """Replicate the train state onto every mesh device.

    Multi-host safe: `jax.device_put` cannot target non-addressable devices,
    so on a pod every process contributes its (identical, seed-deterministic)
    local state and the replicated global jax.Arrays are assembled with
    `make_array_from_process_local_data` (single-process this degenerates to
    a plain device_put)."""
    from .multihost import replicate_to_mesh

    return replicate_to_mesh(state, mesh)
