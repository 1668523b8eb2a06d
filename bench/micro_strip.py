#!/usr/bin/env python3
"""Microbenchmark variants of device strip assembly (the align-mode
bottleneck: 2.3s of each 2.4s banded_arena dispatch at N=4096, lr=8192).

Usage: python bench/micro_strip.py [n_pairs] [lr] [width] [S]
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

from gfalign_tpu.ops.seqalign import PAD  # noqa: E402

rng = np.random.default_rng(0)
A = 2_000_000
arena_np = rng.integers(0, 4, (A,)).astype(np.int8)
arena = jax.device_put(arena_np)
arena32 = jax.device_put(arena_np.astype(np.int32))
P = 4096
steps = rng.integers(400, 1600, (P, S))
cum = np.zeros((P, S), np.int32)
cum[:, 1:] = np.cumsum(steps[:, :-1], axis=1)
plens = (cum[:, -1] + steps[:, -1]).astype(np.int32)
base = (rng.integers(0, A - 20000, (P, S)).astype(np.int64) - cum).astype(np.int32)
cum_off = jax.device_put(cum)
base_ptr = jax.device_put(base)
plen_pool = jax.device_put(plens)

n_cols = (-(-(lr + width) // 8)) * 8 + 8
W2 = width // 2


def mk_current():
    from gfalign_tpu.ops.seqalign import assemble_strip

    @jax.jit
    def fn(path_idx, deltas):
        co = jnp.take(cum_off, path_idx, axis=0, mode="clip")
        bp = jnp.take(base_ptr, path_idx, axis=0, mode="clip")
        plv = jnp.take(plen_pool, path_idx, mode="clip")
        strip = assemble_strip(arena, co, bp, plv, deltas, n_cols,
                               shift=1, w2=W2)
        return jnp.sum(strip.astype(jnp.int32), axis=1)
    return fn


def mk_cmpsel(a):
    """No take_along_axis: step selection by S compare-selects; one final
    arena take."""
    @jax.jit
    def fn(path_idx, deltas):
        co = jnp.take(cum_off, path_idx, axis=0, mode="clip")
        bp = jnp.take(base_ptr, path_idx, axis=0, mode="clip")
        plv = jnp.take(plen_pool, path_idx, mode="clip")
        t = jnp.arange(n_cols, dtype=jnp.int32)
        src = t[None, :] + deltas[:, None] - W2 - 1
        valid = (src >= 0) & (src < plv[:, None])
        srcc = jnp.clip(src, 0, None)
        bsel = jnp.zeros_like(src)
        for s in range(S):
            m = co[:, s:s + 1] <= srcc
            bsel = jnp.where(m, bp[:, s:s + 1], bsel)
        ai = bsel + srcc
        codes = jnp.take(a, jnp.clip(ai, 0, A - 1), mode="clip")
        return jnp.sum(jnp.where(valid, codes, PAD).astype(jnp.int32), axis=1)
    return fn


def mk_gather_only(a):
    """Lower bound: just the final arena take at (n, n_cols)."""
    @jax.jit
    def fn(path_idx, deltas):
        ai = (deltas[:, None] + jnp.arange(n_cols, dtype=jnp.int32)[None, :]
              + path_idx[:, None] * 17) % A
        return jnp.sum(jnp.take(a, ai, mode="clip").astype(jnp.int32), axis=1)
    return fn


def timeit(name, fn, passes=3):
    pidx = rng.integers(0, P, (n,)).astype(np.int32)
    dl = rng.integers(-48, 48, (n,)).astype(np.int32)
    _ = np.asarray(fn(pidx, dl)[0])
    best = float("inf")
    for _ in range(passes):
        pidx = rng.integers(0, P, (n,)).astype(np.int32)
        dl = rng.integers(-48, 48, (n,)).astype(np.int32)
        t0 = time.perf_counter()
        out = fn(pidx, dl)
        _ = np.asarray(out[0])
        best = min(best, time.perf_counter() - t0)
    elems = n * n_cols
    print(f"{name}: {best:.3f}s   {elems / best / 1e6:.0f} Melem/s",
          file=sys.stderr)


timeit("current(bsearch+take8) ", mk_current())
timeit("cmpsel + take int8     ", mk_cmpsel(arena))
timeit("cmpsel + take int32    ", mk_cmpsel(arena32))
timeit("gather-only int8       ", mk_gather_only(arena))
timeit("gather-only int32      ", mk_gather_only(arena32))
