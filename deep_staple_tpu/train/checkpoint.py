"""Checkpoint save/restore of the whole train state as one pytree.

The reference writes seven separate state_dict files per checkpoint
(`utils/torch_utils.py:354-360`) and reloads them through `get_model`
(`main_deep_staple.py:435-462`, save-every-200 + reload cycle :856-873).
Here the single `DeepStapleState` pytree serializes atomically via flax
msgpack; config is stored alongside as JSON.
"""

from __future__ import annotations

import json
from pathlib import Path

from flax import serialization

from ..core.config import TrainConfig
from .state import DeepStapleState


def save_checkpoint(path, state: DeepStapleState, config: TrainConfig | None = None):
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "state.msgpack").write_bytes(serialization.to_bytes(state))
    if config is not None:
        (path / "config.json").write_text(json.dumps(config.to_dict(), indent=2, default=str))


def restore_checkpoint(path, template_state: DeepStapleState) -> DeepStapleState:
    path = Path(path)
    data = (path / "state.msgpack").read_bytes()
    return serialization.from_bytes(template_state, data)


def checkpoint_exists(path) -> bool:
    return (Path(path) / "state.msgpack").is_file()
