#!/usr/bin/env python3
"""Microbenchmark: banded_arena_scores_pallas split into strip assembly
vs banded kernel at pipeline shapes.

Usage: python bench/micro_arena.py [n_pairs] [lr] [width] [S]
"""
from __future__ import annotations

import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
lr = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
width = int(sys.argv[3]) if len(sys.argv) > 3 else 128
S = int(sys.argv[4]) if len(sys.argv) > 4 else 32

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gfalign_tpu.ops import seqalign  # noqa: E402
from gfalign_tpu.ops.seqalign_pallas import banded_arena_scores_pallas  # noqa: E402

rng = np.random.default_rng(0)
A = 2_000_000
arena = jax.device_put(rng.integers(0, 4, (A,)).astype(np.int8))
P = 4096  # path pool rows
seg = 1000  # mean step length
steps = rng.integers(400, 1600, (P, S))
cum = np.zeros((P, S), np.int32)
cum[:, 1:] = np.cumsum(steps[:, :-1], axis=1)
plens = cum[:, -1] + steps[:, -1]
plens = np.minimum(plens, 16000).astype(np.int32)
base = rng.integers(0, A - 20000, (P, S)).astype(np.int32) - cum
cum_off = jax.device_put(cum)
base_ptr = jax.device_put(base.astype(np.int32))
plen_pool = jax.device_put(plens)
NREADS = 2048
read_pool = jax.device_put(rng.integers(0, 4, (NREADS, lr)).astype(np.int8))

strip_pad = (-(-(lr + width) // 8)) * 8 + 8


@jax.jit
def strips_only(read_idx, path_idx, deltas):
    co = jnp.take(cum_off, path_idx, axis=0, mode="clip")
    bp = jnp.take(base_ptr, path_idx, axis=0, mode="clip")
    plv = jnp.take(plen_pool, path_idx, mode="clip")
    strip = seqalign.assemble_strip(arena, co, bp, plv, deltas, strip_pad,
                                    shift=1, w2=width // 2)
    return jnp.sum(strip.astype(jnp.int32), axis=1)


def batch():
    ridx = rng.integers(0, NREADS, (n,)).astype(np.int32)
    pidx = rng.integers(0, P, (n,)).astype(np.int32)
    dl = rng.integers(-48, 48, (n,)).astype(np.int32)
    return ridx, pidx, dl


def timeit(name, fn, passes=3):
    ridx, pidx, dl = batch()
    out = fn(ridx, pidx, dl)
    _ = np.asarray(out[0])  # compile + fetch
    best = float("inf")
    for _ in range(passes):
        ridx, pidx, dl = batch()
        t0 = time.perf_counter()
        out = fn(ridx, pidx, dl)
        _ = np.asarray(out[0] if isinstance(out, tuple) else out)
        best = min(best, time.perf_counter() - t0)
    cells = n * lr * width
    print(f"{name}: {best:.3f}s   {cells / best / 1e9:.2f} Gcell/s",
          file=sys.stderr)
    return best


timeit("strips_only ", strips_only)
timeit("arena_pallas", lambda r, p, d: banded_arena_scores_pallas(
    arena, cum_off, base_ptr, plen_pool, read_pool, r, p, d, width))
fnx = seqalign._jitted_banded_arena(width)
timeit("arena_xla   ", lambda r, p, d: fnx(
    arena, cum_off, base_ptr, plen_pool, read_pool, r, p, d))
