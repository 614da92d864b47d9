"""Spatial sharding: whole-volume 3D segmentation over a ('space',) mesh axis.

The reference handles large volumes by cropping (W 45:95) and resampling
(SURVEY.md §5 "long-context analogue"). The TPU-native alternative is to keep
the whole volume and shard its H axis across chips. Convolutions under GSPMD
are spatially partitioned by XLA itself — the compiler inserts the halo
exchanges (collective-permutes of the kernel-overlap regions) — so the same
Flax model runs sharded without model surgery. This module provides the
shardings and a whole-volume inference wrapper; correctness vs the unsharded
forward is gate-tested on the virtual CPU mesh.

Why H (axis 2 of NDHWC): the backbone downsamples D,H,W by 4 and ASPP dilates
by up to 16, so the shard axis must stay large enough per device; H=128+ in
CrossMoDa L3/whole-volume settings splits cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def volume_sharding(mesh: Mesh, axis: str = "space") -> NamedSharding:
    """Sharding for (B, D, H, W) volumes: H split over the space axis."""
    return NamedSharding(mesh, P(None, None, axis))


def logits_sharding(mesh: Mesh, axis: str = "space") -> NamedSharding:
    return NamedSharding(mesh, P(None, None, axis, None, None))


def make_whole_volume_inference(model, mesh: Mesh, use_mind: bool = False):
    """Sharded eval forward over full volumes.

    Returns a function (variables, image (B, D, H, W)) -> argmax labels,
    with the volume sharded over mesh axis 'space' and parameters replicated.
    """
    rep = NamedSharding(mesh, P())
    vol_sh = volume_sharding(mesh)

    def _fwd(variables, image):
        x = image[..., None]
        if use_mind:
            from ..ops.mind import mindssc

            x = jnp.moveaxis(mindssc(image[:, None]), 1, -1)
        logits = model.apply(variables, x, train=False)["out"]
        return jnp.argmax(logits, axis=-1)

    fwd = jax.jit(
        _fwd,
        in_shardings=(rep, vol_sh),
        out_shardings=vol_sh,
    )

    def infer(variables, image):
        with mesh:
            variables = jax.device_put(variables, rep)
            image = jax.device_put(jnp.asarray(image), vol_sh)
            return fwd(variables, image)

    return infer
