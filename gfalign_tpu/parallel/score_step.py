"""Sharded frontier-scoring step — the framework's multi-chip workhorse.

One step scores a frontier of candidate paths against the full read-path
batch and reduces per-candidate statistics:

  * read batch  (R, m)  sharded over mesh axis "data"
  * candidates  (C, n)  sharded over mesh axis "cand"
  * graph-independent: everything needed is in the padded key tensors

Inside shard_map each device computes its local (C/cand, R/data) score tile
with the NW kernel, masks reads that touch nodes outside the candidate
(the reference's filterAlignments step, src/eval.cpp:81-91), reduces
locally, then `psum`s the (bad, good, unaligned) counts over "data".  The
result is exact — identical to the reference's sequential tallies — because
int32 sums are associative.

This is also the step `__graft_entry__.dryrun_multichip` compiles over an
N-device mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

from ..ops.nw_path import nw_best_scores


def _local_step(a_keys, a_len, b_keys, b_len, use_pallas=False):
    """Per-device tile: scores + masked reduction.  Shapes are the local
    shards: a (Cl, n), b (Rl, m).  Returns (Cl, 3) int32 [bad, good, unaligned].

    On real TPU the Pallas forward scores the tile (~50x the XLA row scan
    on-device); its TILE_R requirement is met by padding the local read
    shard here, inside shard_map, where shapes are static — padded rows
    carry b_len == 0 and are masked out of every tally below."""
    import jax.numpy as jnp

    if use_pallas:
        from ..ops.nw_pallas import TILE_R, nw_best_scores_pallas

        rl = b_keys.shape[0]
        rl_pad = -(-rl // TILE_R) * TILE_R
        bk = jnp.pad(b_keys, ((0, rl_pad - rl), (0, 0)), constant_values=-3)
        bl = jnp.pad(b_len, (0, rl_pad - rl))
        scores = nw_best_scores_pallas(a_keys, a_len, bk, bl)[:, :rl]
    else:
        scores = nw_best_scores(a_keys, a_len, b_keys, b_len)  # (Cl, Rl)

    import jax

    a_ids = jnp.where(a_keys >= 0, a_keys // 4, -1)            # (Cl, n)
    b_ids = jnp.where(b_keys >= 0, b_keys // 4, -2)            # (Rl, m)
    # membership: read step id present anywhere in candidate id list.
    # Binary search against each candidate's sorted id list keeps the
    # intermediate at (Cl, Rl, m) — the naive broadcast-compare builds a
    # (Cl, Rl, m, n) bool that is ~2 GB/shard at realistic frontier shapes
    # (C=64, R=8192, m=n=64); the reference's equivalent filter is
    # O(reads*steps) (src/eval.cpp:81-91).
    a_sorted = jnp.sort(a_ids, axis=-1)                        # (Cl, n)

    def _member(c_sorted):
        idx = jnp.searchsorted(c_sorted, b_ids)                # (Rl, m)
        return jnp.take(c_sorted, jnp.minimum(idx, c_sorted.shape[0] - 1)) == b_ids

    in_cand = jax.vmap(_member)(a_sorted)                      # (Cl, Rl, m)
    valid_step = (b_ids >= 0)[None]                            # (1, Rl, m)
    offending = valid_step & ~in_cand                          # (Cl, Rl, m)
    off_per_read = offending.sum(-1)                           # (Cl, Rl)
    real_read = (b_len > 0)[None, :]
    keep = (off_per_read == 0) & real_read
    bad = ((scores < 0) & keep).sum(-1)
    good = ((scores >= 0) & keep).sum(-1)
    unaligned = jnp.where(real_read, off_per_read, 0).sum(-1)
    return jnp.stack([bad, good, unaligned], axis=-1).astype(jnp.int32)


def sharded_scoring_step(mesh, a_keys, a_len, b_keys, b_len,
                         use_pallas=None):
    """shard_map'd frontier scoring over a ("data", "cand") mesh."""
    import jax
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    if use_pallas is None:
        from ..ops.nw_path import _pallas_eligible

        use_pallas = _pallas_eligible()

    def step(ak, al, bk, bl):
        local = _local_step(ak, al, bk, bl, use_pallas=use_pallas)
        return jax.lax.psum(local, "data")

    mapped = shard_map(
        step, mesh=mesh,
        in_specs=(P("cand", None), P("cand"), P("data", None), P("data")),
        out_specs=P("cand", None),
        # pallas_call out_shapes carry no vma annotation; the XLA path keeps
        # the stricter varying-axes checking
        check_vma=not use_pallas,
    )
    return mapped(a_keys, a_len, b_keys, b_len)


@functools.lru_cache(maxsize=None)
def make_sharded_scorer(mesh_key):
    """jit-compiled sharded step bound to a mesh (cached per mesh)."""
    import jax

    mesh = mesh_key.mesh if hasattr(mesh_key, "mesh") else mesh_key

    @jax.jit
    def run(a_keys, a_len, b_keys, b_len):
        return sharded_scoring_step(mesh, a_keys, a_len, b_keys, b_len)

    return run


def pad_for_mesh(arr: np.ndarray, lens: np.ndarray, shards: int,
                 pad_key: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad the leading batch dim to a multiple of the mesh axis size."""
    n = arr.shape[0]
    target = -(-max(n, 1) // shards) * shards
    if target == n:
        return arr, lens
    extra = target - n
    arr = np.concatenate([arr, np.full((extra,) + arr.shape[1:], pad_key, arr.dtype)])
    lens = np.concatenate([lens, np.zeros((extra,), lens.dtype)])
    return arr, lens
