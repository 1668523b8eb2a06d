"""Device-mesh construction.

The reference's entire parallelism is a host thread pool guarded by a single
mutex (src/main.cpp:58-60, src/alignments.cpp:184-210).  Here parallelism is
expressed on a jax.sharding.Mesh:

  * axis "data"  — read/GAF batches (data parallel; stat merges are psum);
  * axis "cand"  — candidate paths of a search frontier (tensor-parallel-like
    split of the scoring matrix's other dimension).

Assembly graphs are small (<< HBM), so graph tensors are replicated;
read batches and frontier candidates are the sharded dimensions.
Multi-host runs initialize jax.distributed and shard input files by record
index modulo process count (see io loaders).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def default_mesh_shape(n_devices: int) -> Tuple[int, int]:
    """(data, cand) factorization: favor the data axis, keep cand <= 8."""
    cand = 1
    for c in (8, 4, 2):
        if n_devices % c == 0 and n_devices // c >= c // 2:
            cand = c
            break
    if n_devices % cand:
        cand = 1
    return n_devices // cand, cand


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data", "cand")):
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if len(axis_names) == 1:
        shape = (n,)
    else:
        shape = default_mesh_shape(n)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names[:len(shape)]))


def distributed_init_if_requested() -> None:
    """Initialize jax.distributed when launched as a real multi-process job
    (coordinator address present in the environment).  Safe no-op for
    single-process runs even with GFALIGN_TPU_DISTRIBUTED set."""
    import os

    has_cluster = any(os.environ.get(k) for k in
                      ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                       "MEGASCALE_COORDINATOR_ADDRESS"))
    if os.environ.get("GFALIGN_TPU_DISTRIBUTED") and has_cluster:
        import jax
        jax.distributed.initialize()
