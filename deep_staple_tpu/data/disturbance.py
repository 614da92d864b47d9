"""Label fault-injection ("disturbance") engine.

Re-implements `HybridIdLoader.disturb_idxs` (:376-444): synthetic corruption
of a chosen subset of training labels, used to validate that data parameters
detect corrupted samples (`main_deep_staple.py:564-587`). Two modes:

  * FLIP_ROLL: axis transpose/permute + random integer roll (:408-428),
  * AFFINE: a strong random affine warp via the spatial-augment machinery
    (:430-436) with affine_strength=0.09*s and translation 0.18*s.

Per-index determinism comes from seeding with the dataset index (the
reference's `torch_manual_seeded(idx)`, :407). Exact RNG streams differ from
torch; the distribution and determinism contract are preserved.
"""

from __future__ import annotations

import numpy as np

from ..core.config import LabelDisturbanceMode


def disturb_label(label: np.ndarray, mode, strength: float, seed: int, use_2d: bool = False):
    rng = np.random.RandomState(seed)
    if str(mode) == str(LabelDisturbanceMode.FLIP_ROLL):
        roll_strength = 10.0 * strength
        if use_2d:
            rolled = np.swapaxes(label, -2, -1)
            shifts = (int(rng.randn() * roll_strength), int(rng.randn() * roll_strength))
            return np.roll(rolled, shifts, axis=(-2, -1))
        rolled = np.transpose(label, (1, 2, 0))
        shifts = tuple(int(rng.randn() * roll_strength) for _ in range(3))
        return np.roll(rolled, shifts, axis=(-3, -2, -1))

    if str(mode) == str(LabelDisturbanceMode.AFFINE):
        import jax
        import jax.numpy as jnp

        from ..ops.augment import AugmentParams, spatial_augment

        params = AugmentParams(
            bspline_num_ctl_points=6,
            bspline_strength=0.0,
            bspline_probability=0.0,
            affine_strength=0.09 * strength,
            add_affine_translation=0.18 * strength,
            affine_probability=1.0,
        )
        key = jax.random.PRNGKey(seed)
        _, out, _ = spatial_augment(
            key, None, jnp.asarray(label[None].astype(np.int32)), params, use_2d=use_2d
        )
        return np.asarray(out[0]).astype(label.dtype)

    raise ValueError(f"Disturbance mode {mode} is not implemented.")
