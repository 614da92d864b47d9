"""Single-volume inference API.

Capability parity with `inference_wrap` (`main_deep_staple.py:471-487`):
forward one volume (optionally through MIND-SSC features), argmax to a label
map. Jitted per shape; for whole-volume multi-chip inference see
`parallel.spatial.make_whole_volume_inference`.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from .step import _featurize


def make_inference_fn(model, use_mind: bool = False, use_2d: bool = False):
    @jax.jit
    def infer(params, batch_stats, img):
        """img: (*spatial,) single volume/slice -> (*spatial,) int32 labels."""
        x = _featurize(img[None].astype(jnp.float32), use_mind, use_2d)
        out = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)["out"]
        return jnp.argmax(out, axis=-1)[0]

    return infer


def inference_wrap(model, state, img, use_mind: bool = False, use_2d: bool = False):
    return make_inference_fn(model, use_mind, use_2d)(state.params, state.batch_stats, jnp.asarray(img))
