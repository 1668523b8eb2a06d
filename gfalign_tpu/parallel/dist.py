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


_LOCAL_COUNT = [0]


def local_process_count() -> int:
    """Number of job processes running on THIS host (>= 1), via a one-time
    hostname census through the coordination-service KV store.  Used to
    divide host cores among co-located processes (e.g. the distributed
    align mode caps each process's native thread pool at
    cores / local_process_count so same-host scaling runs don't
    oversubscribe).  Falls back to the full process count (the
    conservative same-host assumption) when the KV client is missing."""
    if _LOCAL_COUNT[0]:
        return _LOCAL_COUNT[0]
    pid, count = process_info()
    if count == 1:
        _LOCAL_COUNT[0] = 1
        return 1
    try:
        import socket

        from jax._src import distributed

        client = distributed.global_state.client
        if client is None:
            raise RuntimeError("no distributed client")
        host = socket.gethostname()
        client.key_value_set(f"gfhost/{pid}", host)
        n = sum(1 for p in range(count)
                if client.blocking_key_value_get(f"gfhost/{p}",
                                                 600_000) == host)
        _LOCAL_COUNT[0] = max(1, n)
    except Exception:
        _LOCAL_COUNT[0] = count
    return _LOCAL_COUNT[0]


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


# Sequence counter for the coordination-service allreduce; all processes
# call allreduce_stats in the same order (the search loop is replicated and
# deterministic), so equal counters name the same logical collective.
_KV_SEQ = [0]


class _ShmExchange:
    """Same-host cross-process int64 allreduce over a /dev/shm mapping.

    Per-frontier score merges are tiny (a few KB) and latency-bound; when
    every process in the job shares one host (the 2-process scaling bench;
    single-host multi-process runs in general), a shared-memory exchange
    costs ~10 us per call vs ~1 ms through the coordination service and
    ~3.5 ms through a device psum.  Layout: per process, two parity
    buffers (double buffering: a peer can be one sequence ahead, never
    two, because advancing requires reading every peer's current buffer)
    of [seq, len, data[WIDTH]] int64.  x86 TSO keeps the data-then-seq
    store order; the seq store is one aligned int64 write.

    Validation: rank 0 creates the file and writes a random token which it
    also publishes through the KV store; every other rank requires the
    mapped token to match — two containers that merely share a hostname
    fail this and fall back to the KV exchange."""

    WIDTH = 4096

    def __init__(self, client, pid: int, count: int, tag: str):
        import mmap
        import os

        self.pid, self.count = pid, count
        slot = 2 + self.WIDTH                 # int64s per parity buffer
        self._slot = slot
        size = count * 2 * slot * 8
        path = f"/dev/shm/gfalign_ar_{tag}"
        self._path = path
        if pid == 0:
            token = int.from_bytes(os.urandom(7), "little")
            # O_TRUNC: a pre-existing file from a crashed run with the same
            # coordinator tag must not leak stale seq cells (ftruncate to an
            # unchanged size preserves contents; a stale pb[0] >= s would
            # satisfy the wait immediately and merge dead data)
            fd = os.open(path, os.O_CREAT | os.O_RDWR | os.O_TRUNC, 0o600)
            try:
                os.ftruncate(fd, size + 8)
                self._mm = mmap.mmap(fd, size + 8)
            finally:
                os.close(fd)
            self._arr = np.frombuffer(self._mm, dtype=np.int64)
            self._arr[0] = token
            client.key_value_set(f"gfshm/{tag}/token", str(token))
            import atexit

            atexit.register(self._cleanup)
        else:
            want = int(client.blocking_key_value_get(f"gfshm/{tag}/token",
                                                     600_000))
            import time as _time

            deadline = _time.monotonic() + 60.0
            while True:
                try:
                    fd = os.open(path, os.O_RDWR)
                    break
                except FileNotFoundError:
                    if _time.monotonic() > deadline:
                        raise
                    _time.sleep(0.001)
            try:
                self._mm = mmap.mmap(fd, size + 8)
            finally:
                os.close(fd)
            self._arr = np.frombuffer(self._mm, dtype=np.int64)
            if int(self._arr[0]) != want:
                raise RuntimeError("shm token mismatch (not same host?)")
        self._seq = 0

    def _cleanup(self):
        import os

        try:
            os.unlink(self._path)
        except OSError:
            pass

    def _buf(self, pid: int, parity: int) -> np.ndarray:
        base = 1 + (pid * 2 + parity) * self._slot
        return self._arr[base:base + self._slot]

    def allreduce(self, totals) -> List[int]:
        import time as _time

        self._seq += 1
        s = self._seq
        vec = np.asarray(totals, dtype=np.int64)
        n = vec.shape[0]
        mine = self._buf(self.pid, s % 2)
        mine[2:2 + n] = vec
        mine[1] = n
        mine[0] = s                            # release: data before seq
        acc = vec.copy()
        for peer in range(self.count):
            if peer == self.pid:
                continue
            pb = self._buf(peer, s % 2)
            spins = 0
            while pb[0] < s:
                spins += 1
                if spins > 2000:
                    _time.sleep(0.0002)
                else:
                    _time.sleep(0)
            acc += pb[2:2 + n]
        return [int(v) for v in acc]


class _ShmRing:
    """Pipelined tally ring for the native search driver (the C++ side of
    the protocol is native/gfalign_host.cpp RingX; see there for the
    ordering argument).  Python only creates/maps/resets the buffer —
    publication and draining happen in native code.

    Layout (int64): [token][drained counter x count][count x SLOTS slots
    of [seq, len, data[WIDTH]]]."""

    WIDTH = 16384
    SLOTS = 8

    def __init__(self, client, pid: int, count: int, tag: str):
        import mmap
        import os

        self.pid, self.count = pid, count
        slot = 2 + self.WIDTH
        self._slot = slot
        n_i64 = 1 + count + count * self.SLOTS * slot
        size = n_i64 * 8
        path = f"/dev/shm/gfalign_ring_{tag}"
        self._path = path
        if pid == 0:
            token = int.from_bytes(os.urandom(7), "little")
            # O_TRUNC zero-fills: stale slot seq cells from a crashed prior
            # run must never satisfy a wait (see _ShmExchange.__init__)
            fd = os.open(path, os.O_CREAT | os.O_RDWR | os.O_TRUNC, 0o600)
            try:
                os.ftruncate(fd, size)
                self._mm = mmap.mmap(fd, size)
            finally:
                os.close(fd)
            self._arr = np.frombuffer(self._mm, dtype=np.int64)
            self._arr[0] = token
            client.key_value_set(f"gfring/{tag}/token", str(token))
            import atexit

            atexit.register(self._cleanup)
        else:
            want = int(client.blocking_key_value_get(f"gfring/{tag}/token",
                                                     600_000))
            import time as _time

            deadline = _time.monotonic() + 60.0
            while True:
                try:
                    fd = os.open(path, os.O_RDWR)
                    break
                except FileNotFoundError:
                    if _time.monotonic() > deadline:
                        raise
                    _time.sleep(0.001)
            try:
                self._mm = mmap.mmap(fd, size)
            finally:
                os.close(fd)
            self._arr = np.frombuffer(self._mm, dtype=np.int64)
            if int(self._arr[0]) != want:
                raise RuntimeError("ring token mismatch (not same host?)")

    def _cleanup(self):
        import os

        try:
            os.unlink(self._path)
        except OSError:
            pass

    def reset_local(self) -> None:
        """Zero this process's drained counter and slot seq cells so a new
        search starts from batch 0 (each process resets only cells it
        owns; callers barrier afterwards)."""
        self._arr[1 + self.pid] = 0
        base = 1 + self.count + self.pid * self.SLOTS * self._slot
        for s in range(self.SLOTS):
            self._arr[base + s * self._slot] = 0

    @property
    def address(self) -> int:
        return int(self._arr.ctypes.data)


_SHM: list = [None]  # None = untried, False = unavailable, else exchange
_RING: list = [None]


def _shm_exchange():
    """Establish (once) the same-host shm exchange, or False.  All ranks
    agree via a KV handshake — ranks on another host fail the token check,
    and any failure anywhere disables shm everywhere (no transport
    divergence)."""
    got = _SHM[0]
    if got is not None:
        return got
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        if client is None:
            raise RuntimeError("no distributed client")
        pid, count = process_info()
        addr = distributed.global_state.coordinator_address or "na"
        tag = "".join(ch if ch.isalnum() else "_" for ch in addr)
        ex = None
        err = "0"
        try:
            ex = _ShmExchange(client, pid, count, tag)
            err = "1"
        except Exception:
            ex = None
        client.key_value_set(f"gfshm/{tag}/ok/{pid}", err)
        all_ok = all(
            client.blocking_key_value_get(f"gfshm/{tag}/ok/{p}",
                                          600_000) == "1"
            for p in range(count))
        if all_ok and ex is not None:
            _SHM[0] = ex
        else:
            if ex is not None and pid == 0:
                ex._cleanup()
            _SHM[0] = False
    except Exception:
        _SHM[0] = False
    return _SHM[0]


def _shm_ring():
    """Establish (once) the same-host pipelined ring, or False.  Same
    KV handshake pattern as _shm_exchange."""
    got = _RING[0]
    if got is not None:
        return got
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        if client is None:
            raise RuntimeError("no distributed client")
        pid, count = process_info()
        addr = distributed.global_state.coordinator_address or "na"
        tag = "".join(ch if ch.isalnum() else "_" for ch in addr)
        ring = None
        err = "0"
        try:
            ring = _ShmRing(client, pid, count, tag)
            err = "1"
        except Exception:
            ring = None
        client.key_value_set(f"gfring/{tag}/ok/{pid}", err)
        all_ok = all(
            client.blocking_key_value_get(f"gfring/{tag}/ok/{p}",
                                          600_000) == "1"
            for p in range(count))
        if all_ok and ring is not None:
            _RING[0] = ring
        else:
            if ring is not None and pid == 0:
                ring._cleanup()
            _RING[0] = False
    except Exception:
        _RING[0] = False
    return _RING[0]


def _kv_allreduce(totals: List[int], count: int) -> List[int] | None:
    """Tiny-host-vector allreduce over jax.distributed's coordination
    service (gRPC key-value store): each process publishes its int64
    vector and reads the peers'.  ~1 ms on localhost vs ~3.5 ms for the
    device psum + make_array machinery — and per-frontier score merges in
    thin-workload search are exactly this shape (a few hundred bytes).
    Large payloads or a missing client return None (caller falls back to
    the device psum, which on real pods rides ICI).

    Key retirement: at sequence s every peer has COMPLETED sequence s-2
    (to issue s it finished s-1, which required reading every peer's s-1
    key, which required every peer to have finished s-2), so deleting our
    own s-2 key is race-free."""
    try:
        import jax
        from jax._src import distributed

        client = distributed.global_state.client
        if client is None:
            return None
    except Exception:
        return None
    pid, _ = process_info()
    seq = _KV_SEQ[0]
    _KV_SEQ[0] += 1
    payload = np.asarray(totals, dtype=np.int64).tobytes().hex()
    client.key_value_set(f"gfar/{seq}/{pid}", payload)
    acc = np.asarray(totals, dtype=np.int64)
    for peer in range(count):
        if peer == pid:
            continue
        raw = client.blocking_key_value_get(f"gfar/{seq}/{peer}", 600_000)
        acc = acc + np.frombuffer(bytes.fromhex(raw), dtype=np.int64)
    if seq >= 2:
        try:
            client.key_value_delete(f"gfar/{seq - 2}/{pid}")
        except Exception:
            pass
    return [int(v) for v in acc]


def allreduce_stats(totals: List[int], mesh=None) -> List[int]:
    """Sum per-host int totals across all devices/hosts.

    Small vectors (<= 4096 entries) go through the coordination-service
    exchange (_kv_allreduce); larger ones, or runs without a distributed
    client, use a psum over the mesh's first axis.  With one process this
    is the identity.  Exact: int64 addition is associative.  The mesh,
    sharding, and compiled psum persist across calls (_REDUCER_CACHE)."""
    _, count = process_info()
    if count == 1 and mesh is None:
        return list(totals)
    if count > 1 and len(totals) <= _ShmExchange.WIDTH:
        ex = _shm_exchange()
        if ex:
            return ex.allreduce(totals)
        got = _kv_allreduce(totals, count)
        if got is not None:
            return got
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
