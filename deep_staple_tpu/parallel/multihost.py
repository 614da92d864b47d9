"""Per-host input sharding for multi-host (pod) training.

On a multi-host TPU slice each host feeds only the batch rows that land on
its local devices; the jitted step then assembles the global batch via
`jax.make_array_from_process_local_data`. The reference has no distributed
path at all (SURVEY.md §2.7); this is the standard JAX multi-host input
recipe, kept separate from the single-host `mesh.py` helpers so the driver
can adopt it without touching the single-process path.

The index math is pure and host-count-agnostic, so it is unit-tested
directly; the device-side assembly is exercised on a single process (where
it degenerates to a plain device_put).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_shard_indices(global_indices, num_hosts: int, host_id: int) -> np.ndarray:
    """The contiguous slice of a global batch-index array this host feeds.

    Row blocks are contiguous (not strided) so they match GSPMD's
    row-major ('data',) layout of the global batch across processes. The
    global length must divide evenly by num_hosts — the driver already
    truncates batches to a multiple of the data axis.
    """
    global_indices = np.asarray(global_indices)
    n = len(global_indices)
    if n % num_hosts:
        raise ValueError(f"global batch of {n} does not divide over {num_hosts} hosts")
    per = n // num_hosts
    return global_indices[host_id * per : (host_id + 1) * per]


def replicate_to_mesh(tree, mesh: Mesh):
    """Fully replicate host arrays onto every mesh device, multi-host safe.

    `jax.device_put` cannot target non-addressable devices; on a pod every
    process passes the SAME full array here and
    `make_array_from_process_local_data` assembles the replicated global
    jax.Array. Single-process it degenerates to a plain device_put.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        # Fast path: no host round trip — device_put replicates directly
        # (arrays already on device move without touching the host).
        return jax.device_put(tree, sharding)
    return jax.tree.map(
        lambda v: jax.make_array_from_process_local_data(sharding, np.asarray(v)), tree
    )


def coordination_barrier(name: str, timeout_ms: int = 1_200_000) -> None:
    """Block until every process reaches this barrier (coordination service).

    Uses the distributed runtime's gRPC barrier, NOT a device collective, so
    it works while processes are arbitrarily skewed. The driver calls it
    after AOT-compiling the train step and before its first dispatch: the
    first cross-process collective otherwise opens its transport rendezvous
    (Gloo on CPU: 30s connect window) as soon as the FASTEST process
    dispatches, and dataset-load + compile skew between processes can exceed
    that, failing the whole job before step one.
    """
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def local_batch_to_global(local_batch: dict, mesh: Mesh, spatial_axis: bool = False):
    """Assemble per-host local batch arrays into global sharded jax.Arrays.

    local_batch holds THIS process's rows only; the result is a dict of
    global arrays sharded over the mesh's ('data',) axis (and optionally the
    H axis over 'space'), suitable for the same jitted train step as the
    single-host path.
    """
    out = {}
    for k, v in local_batch.items():
        v = np.asarray(v)
        use_space = spatial_axis and v.ndim >= 3
        spec = P("data", None, "space") if use_space else P("data")
        sharding = NamedSharding(mesh, spec)
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
