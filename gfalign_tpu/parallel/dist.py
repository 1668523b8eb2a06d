"""Multi-host data pipeline: sharded loading + collective stat merges.

The reference's data parallelism is a thread pool appending GAF batches
under one mutex (reference src/alignments.cpp:180-212).  The TPU-native
equivalent:

  * each host process loads only records with index % process_count ==
    process_index (deterministic, order-preserving within a host);
  * scalar statistics (the eight load-time totals + orientation counts)
    are merged with one psum over the mesh;
  * per-read score tallies in the engines already psum inside
    parallel/score_step.py.

Single-process runs degrade to identity (process_count == 1), so every
engine can call these unconditionally.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, TypeVar

import numpy as np

T = TypeVar("T")


def process_info():
    """(process_index, process_count) — (0, 1) when not distributed."""
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def shard_records(records: Iterable[T],
                  process_index: int | None = None,
                  process_count: int | None = None) -> Iterator[T]:
    """Yield this host's shard: records with index % count == index."""
    if process_index is None or process_count is None:
        process_index, process_count = process_info()
    for i, rec in enumerate(records):
        if i % process_count == process_index:
            yield rec


def allreduce_stats(totals: List[int], mesh=None) -> List[int]:
    """Sum per-host int totals across all devices/hosts.

    Uses a tiny psum over the mesh's first axis; with one process this is
    the identity.  Exact: int64 addition is associative."""
    _, count = process_info()
    if count == 1 and mesh is None:
        return list(totals)
    import jax
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    if mesh is None:
        from .mesh import make_mesh

        mesh = make_mesh(axis_names=("data",))
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n_local = max(1, n_dev // max(1, count))
    # one contribution row per device; only each host's FIRST device carries
    # the host totals, so the psum counts every host exactly once
    local = np.zeros((n_local, len(totals)), dtype=np.int64)
    local[0] = np.asarray(totals, dtype=np.int64)
    flat_mesh = mesh.devices.reshape(-1)
    from jax.sharding import Mesh, NamedSharding

    mesh1d = Mesh(flat_mesh, (axis,))
    sharding = NamedSharding(mesh1d, P(axis, None))
    if count == 1:
        garr = jax.device_put(local, sharding)
    else:
        garr = jax.make_array_from_process_local_data(sharding, local)

    def reduce_fn(x):
        return jax.lax.psum(x, axis)

    mapped = shard_map(reduce_fn, mesh=mesh1d,
                       in_specs=P(axis, None), out_specs=P(axis, None))
    result = mapped(garr)
    # after the psum every shard holds the global totals; only the local
    # addressable shard can be fetched in a multi-process run
    local = np.asarray(result.addressable_shards[0].data)
    return [int(v) for v in local[0]]


def allgather_bytes(payload: bytes) -> List[bytes]:
    """Gather one bytes blob from every process; returns blobs in process
    order.  Single-process runs degrade to [payload].  Mechanism: an
    allgather of sizes, then one padded uint8 allgather (Gloo/ICI via
    jax.experimental.multihost_utils)."""
    try:
        import jax

        n_proc = jax.process_count()
    except Exception:
        n_proc = 1
    if n_proc == 1:
        return [payload]
    from jax.experimental import multihost_utils

    sizes = np.asarray(multihost_utils.process_allgather(
        np.array([len(payload)], np.int64))).reshape(-1)
    width = max(int(sizes.max()), 1)
    buf = np.zeros(width, np.uint8)
    buf[:len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    gathered = gathered.reshape(n_proc, width)
    return [gathered[i, :sizes[i]].tobytes() for i in range(n_proc)]
