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


# Persistent reducer state: the 1-D mesh, sharding, and jitted psum are
# built ONCE per (mesh, padded-width) and reused for every frontier — the
# old per-call rebuild dominated multi-host search time (one reduction per
# frontier at up to 100k frontiers/run).  Widths are padded to powers of two
# so varying frontier sizes share compiles.
_REDUCER_CACHE: dict = {}


def _reducer(mesh, width: int, count: int):
    key = (id(mesh) if mesh is not None else None, width)
    got = _REDUCER_CACHE.get(key)
    if got is not None:
        return got
    import jax
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    if mesh is None:
        from .mesh import make_mesh

        mesh = make_mesh(axis_names=("data",))
    axis = mesh.axis_names[0]
    n_local = max(1, mesh.devices.size // max(1, count))
    mesh1d = Mesh(mesh.devices.reshape(-1), (axis,))
    sharding = NamedSharding(mesh1d, P(axis, None))

    mapped = jax.jit(shard_map(lambda x: jax.lax.psum(x, axis), mesh=mesh1d,
                               in_specs=P(axis, None), out_specs=P(axis, None)))
    got = (mesh1d, sharding, mapped, n_local)
    _REDUCER_CACHE[key] = got
    return got


def allreduce_stats(totals: List[int], mesh=None) -> List[int]:
    """Sum per-host int totals across all devices/hosts.

    Uses a tiny psum over the mesh's first axis; with one process this is
    the identity.  Exact: int64 addition is associative.  The mesh,
    sharding, and compiled psum persist across calls (see _REDUCER_CACHE)."""
    _, count = process_info()
    if count == 1 and mesh is None:
        return list(totals)
    import jax

    n = len(totals)
    width = 1
    while width < n:
        width *= 2
    _, sharding, mapped, n_local = _reducer(mesh, width, count)
    # one contribution row per device; only each host's FIRST device carries
    # the host totals, so the psum counts every host exactly once
    local = np.zeros((n_local, width), dtype=np.int64)
    local[0, :n] = np.asarray(totals, dtype=np.int64)
    if count == 1:
        garr = jax.device_put(local, sharding)
    else:
        garr = jax.make_array_from_process_local_data(sharding, local)
    result = mapped(garr)
    # after the psum every shard holds the global totals; only the local
    # addressable shard can be fetched in a multi-process run
    local = np.asarray(result.addressable_shards[0].data)
    return [int(v) for v in local[0, :n]]


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
