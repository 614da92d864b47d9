"""Determinism helpers.

The reference resets torch/numpy/random global seeds before data prep and
training (`utils/torch_utils.py:364-368`). In JAX, randomness is explicit via
keys; these helpers cover the host-side (numpy) RNG used by samplers and the
disturbance engine, and hand out root PRNG keys.
"""

from __future__ import annotations

import random

import numpy as np


def reset_determinism(seed: int = 0):
    random.seed(seed)
    np.random.seed(seed)


def seeded_rng(seed: int) -> np.random.RandomState:
    """Per-index deterministic RNG (mirrors `torch_manual_seeded(idx)` usage,
    `HybridIdLoader.py:407`)."""
    return np.random.RandomState(seed)
