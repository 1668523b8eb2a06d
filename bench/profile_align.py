#!/usr/bin/env python3
"""Stage-level profiling of the seeded align path on a saved workload.

Usage: python bench/profile_align.py [n_reads] [--cprofile]
Reads bench/.workload/{graph.gfa,reads.fq}; reports wall time of index
build, candidate generation, and the placement rounds (scoring vs
traceback split via monkeypatched timers).
"""
from __future__ import annotations

import cProfile
import pathlib
import pstats
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
use_cprofile = "--cprofile" in sys.argv

from gfalign_tpu.io.gfa import read_gfa  # noqa: E402
from gfalign_tpu.engine.graph_align import align_reads, load_reads  # noqa: E402
from gfalign_tpu.ops import seqalign  # noqa: E402

graph = read_gfa(str(ROOT / "bench/.workload/graph.gfa"))
reads = load_reads([str(ROOT / "bench/.workload/reads.fq")])[:n_reads]
print(f"{len(reads)} reads, {graph.n_segments} segments", file=sys.stderr)

# wrap the device-scoring + traceback entry points with timers
acc = {}


def timed(name, fn):
    def wrapper(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        dt = time.perf_counter() - t0
        acc[name] = acc.get(name, 0.0) + dt
        acc[name + "_calls"] = acc.get(name + "_calls", 0) + 1
        if dt > 2.0:
            print(f"  [{name} call {acc[name + '_calls']}: {dt:.1f}s]",
                  file=sys.stderr, flush=True)
        return out
    return wrapper


seqalign.banded_pair_scores = timed("banded_scores", seqalign.banded_pair_scores)
seqalign.banded_arena_scores = timed("banded_arena", seqalign.banded_arena_scores)
seqalign.batched_pair_scores = timed("full_scores", seqalign.batched_pair_scores)
seqalign.banded_traceback = timed("banded_tb", seqalign.banded_traceback)
seqalign.traceback = timed("full_tb", seqalign.traceback)

import gfalign_tpu.engine.seeding as seeding  # noqa: E402

seeding.KmerIndex.anchors_with_diag = timed(
    "anchors", seeding.KmerIndex.anchors_with_diag)
seeding.paths_around_anchor = timed("paths_around", seeding.paths_around_anchor)
import gfalign_tpu.engine.graph_align as ga  # noqa: E402
ga.paths_around_anchor = seeding.paths_around_anchor

t0 = time.perf_counter()
if use_cprofile:
    pr = cProfile.Profile()
    pr.enable()
results = align_reads(graph, reads)
if use_cprofile:
    pr.disable()
total = time.perf_counter() - t0
n_hits = sum(len(h) for _, _, h in results)
print(f"total {total:.2f}s  {len(reads)/total:.1f} reads/s  {n_hits} hits",
      file=sys.stderr)
for k in sorted(acc):
    if k.endswith("_calls"):
        continue
    print(f"  {k:16s} {acc[k]:8.2f}s  ({acc[k + '_calls']} calls)",
          file=sys.stderr)
print(f"  unaccounted      {total - sum(v for k, v in acc.items() if not k.endswith('_calls')):8.2f}s",
      file=sys.stderr)
if use_cprofile:
    stats = pstats.Stats(pr, stream=sys.stderr)
    stats.sort_stats("cumulative").print_stats(30)

# the tunnel backend can hang interpreter teardown for many minutes;
# everything is flushed, so exit hard
sys.stderr.flush()
sys.stdout.flush()
import os  # noqa: E402

os._exit(0)
