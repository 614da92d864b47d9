"""Checkpoint save/restore of the whole train state as one pytree.

The reference writes seven separate state_dict files per checkpoint
(`utils/torch_utils.py:354-360`) and reloads them through `get_model`
(`main_deep_staple.py:435-462`, save-every-200 + reload cycle :856-873).
Here the single `DeepStapleState` pytree serializes atomically; config is
stored alongside as JSON. Two backends:

  * 'msgpack' (default) — flax msgpack bytes, one file, dependency-light.
  * 'orbax'  — Orbax `StandardCheckpointHandler` directory (the idiomatic
    large-scale JAX checkpoint format: per-array storage, sharding-aware,
    readable by any orbax-based tooling). Select with
    `TrainConfig.checkpoint_backend='orbax'`.

Restore auto-detects whichever backend is on disk, so checkpoints stay
readable when the configured backend changes between runs.
"""

from __future__ import annotations

import json
from pathlib import Path

from flax import serialization

from ..core.config import TrainConfig
from .state import DeepStapleState


def _orbax_checkpointer():
    import orbax.checkpoint as ocp

    # Sync Checkpointer (not the async StandardCheckpointer wrapper): the
    # driver's save-every-N cycle immediately reloads (reference :856-873),
    # so the write must be committed on return.
    return ocp, ocp.Checkpointer(ocp.StandardCheckpointHandler())


def save_checkpoint(path, state: DeepStapleState, config: TrainConfig | None = None,
                    backend: str = "msgpack"):
    """Write one checkpoint.

    Multi-host: the msgpack backend is a plain local write — call it from
    process 0 only (the driver does). The orbax backend is a GLOBAL
    COLLECTIVE (`Checkpointer.save` barriers in
    multihost.sync_global_processes): EVERY process must call it, with
    ``path`` on storage shared across hosts; orbax then writes each array
    from the process holding its primary replica. Filesystem cleanup and the
    config sidecar stay process-0-only here, with a barrier between cleanup
    and the collective save so no process enters ``save`` while the stale
    directory is still being removed.
    """
    import jax

    p0 = jax.process_index() == 0
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    if backend == "msgpack":
        (path / "state.msgpack").write_bytes(serialization.to_bytes(state))
        # Drop a stale orbax artifact from a previous run at the same path:
        # restore_checkpoint prefers state.orbax, which would otherwise
        # silently shadow the fresh msgpack state.
        if (path / "state.orbax").is_dir():
            import shutil

            shutil.rmtree(path / "state.orbax")
    elif backend == "orbax":
        ocp, ckptr = _orbax_checkpointer()
        target = (path / "state.orbax").resolve()
        if p0 and target.exists():
            import shutil

            shutil.rmtree(target)
        if jax.process_count() > 1:
            from ..parallel.multihost import coordination_barrier

            coordination_barrier(f"ds_ckpt_clean:{path.name}")
            # Orbax refuses host-local jax.Arrays in multi-host saves (leaves
            # like sched_steps live outside the jitted step and are
            # SingleDeviceSharding). They are replicated-by-construction
            # across processes, so hand them to orbax as numpy, which its
            # array handler writes once from the primary process.
            import numpy as _np

            state = jax.tree.map(
                lambda x: _np.asarray(x)
                if isinstance(x, jax.Array) and x.is_fully_addressable
                else x,
                state,
            )
        ckptr.save(target, args=ocp.args.StandardSave(state))
        if p0:
            # Only after the orbax save landed: until then the msgpack file
            # from a previous run at this path is the last restorable state
            # (restore prefers state.orbax, so it cannot shadow the fresh
            # save; deleting it up-front would leave NOTHING restorable if
            # the collective save crashed mid-way).
            (path / "state.msgpack").unlink(missing_ok=True)
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    if config is not None and p0:
        (path / "config.json").write_text(json.dumps(config.to_dict(), indent=2, default=str))


def restore_checkpoint(path, template_state: DeepStapleState) -> DeepStapleState:
    path = Path(path)
    if (path / "state.orbax").is_dir():
        ocp, ckptr = _orbax_checkpointer()
        return ckptr.restore(
            (path / "state.orbax").resolve(), args=ocp.args.StandardRestore(template_state)
        )
    data = (path / "state.msgpack").read_bytes()
    return serialization.from_bytes(template_state, data)


def checkpoint_exists(path) -> bool:
    return (Path(path) / "state.msgpack").is_file() or (Path(path) / "state.orbax").is_dir()
