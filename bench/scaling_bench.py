#!/usr/bin/env python3
"""Multi-process scaling benchmark on the synthetic scale workload.

Measures the distributed search path end-to-end: N real jax.distributed
processes (Gloo over localhost, CPU backend), qname-sharded read loads,
per-frontier psum-merged scoring (engine/evaluate.distributed_evaluator).
Strong scaling on a fixed workload: efficiency = T1 / (N * T_N).

This box has 2 shared vCPUs, so absolute numbers are host-bound and the
honest configuration is N=2 (one core per process); the communication
volume per frontier is a (C, 3) int32 psum — the compute:communication
ratio analysis lives in BENCHMARKS.md.

Usage: python bench/scaling_bench.py [--segments N] [--reads R]
       [--max-steps M] [--procs P]
Prints one JSON dict.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import socket
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

WORKER = r"""
import io, sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
if nproc > 1:
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=nproc, process_id=pid)
from gfalign_tpu.engine.alignments import AlignmentSet
from gfalign_tpu.engine.search import search
from gfalign_tpu.io.gfa import read_gfa

graph = read_gfa({gfa!r})
aln = AlignmentSet()
# same axis selection as the CLI (cli/main.py): thin read sets replicate
# the reads and shard the frontier; large ones shard the reads
from gfalign_tpu.engine.evaluate import FRONTIER_SHARD_MAX_READS
n_rec = sum(1 for ln in open({gaf!r}, "rb") if ln.strip())
frontier_shard = nproc > 1 and n_rec <= FRONTIER_SHARD_MAX_READS
shard = (pid, nproc) if nproc > 1 and not frontier_shard else None
aln.load({gaf!r}, shard=shard, shard_by="qname")
out = io.StringIO()
# evaluate_fn=None lets the engine pick its fast path (native driver on
# CPU); distributed runs pass the sharding evaluator, whose calls the
# native driver absorbs when the shm exchange is up (eval_s then stays 0
# and the total is the meaningful number)
eval_s = [0.0]
evaluate_fn = None
if nproc > 1:
    from gfalign_tpu.engine.evaluate import (distributed_evaluator,
                                             frontier_sharded_evaluator)
    base_fn = (frontier_sharded_evaluator() if frontier_shard
               else distributed_evaluator())
    def evaluate_fn(*a, **kw):
        t = time.perf_counter()
        try:
            return base_fn(*a, **kw)
        finally:
            eval_s[0] += time.perf_counter() - t
    evaluate_fn.frontier_sharded = getattr(base_fn, "frontier_sharded",
                                           False)
    evaluate_fn.read_sharded = getattr(base_fn, "read_sharded", False)
t0 = time.perf_counter()
search(graph, aln, {nodelist!r}, {source!r}, {dest!r},
       max_steps={max_steps}, out=out, evaluate_fn=evaluate_fn)
dt = time.perf_counter() - t0
import hashlib
print("RESULT", dt)
print("EVAL", eval_s[0])
from gfalign_tpu.io import native as _native
prof = _native.search_profile()
if prof is not None:
    total_s, ev_s, wait_s, waits = prof
    commit_s = max(0.0, total_s - ev_s - wait_s)
    print("PROFILE", round(total_s, 4), round(ev_s, 4), round(wait_s, 4),
          int(waits), round(commit_s, 4))
print("HASH", hashlib.sha256(out.getvalue().encode()).hexdigest(),
      len(out.getvalue()))
"""


def run_procs(n: int, script: pathlib.Path, pin: bool = True) -> tuple:
    """Launch n workers; with pin, each is taskset to its own core so the
    1-proc and N-proc configurations use the same per-process resources
    (unpinned single-process XLA already saturates every core, which would
    make strong scaling unmeasurable on a 2-vCPU box)."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    n_cores = os.cpu_count() or 1
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    procs = [subprocess.Popen(
        (["taskset", "-c", str(i % n_cores)] if pin else [])
        + [sys.executable, str(script), str(i), str(n), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
             for i in range(n)]
    outs = [p.communicate(timeout=3600) for p in procs]
    assert all(p.returncode == 0 for p in procs), [o[1][-800:] for o in outs]
    times, evals, hashes, profiles = [], [], [], []
    for out, _ in outs:
        for ln in out.splitlines():
            if ln.startswith("RESULT"):
                times.append(float(ln.split()[1]))
            if ln.startswith("EVAL"):
                evals.append(float(ln.split()[1]))
            if ln.startswith("PROFILE"):
                t, e, w, nw, c = ln.split()[1:]
                profiles.append({"total_s": float(t), "eval_s": float(e),
                                 "ring_wait_s": float(w), "waits": int(nw),
                                 "commit_s": float(c)})
            if ln.startswith("HASH"):
                hashes.append(ln.split()[1:])
    assert len(set(map(tuple, hashes))) == 1, "processes disagree on output"
    return max(times), max(evals), hashes[0], profiles


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=1000)
    ap.add_argument("--reads", type=int, default=2000)
    ap.add_argument("--max-steps", type=int, default=2000)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--workdir", type=str, default=str(ROOT / "bench" / ".scaling"))
    ap.add_argument("--reuse", type=str, default=None,
                    help="existing workload dir with graph.gfa + align.gaf "
                         "+ search_nodelist.tsv (skips generation + align)")
    ap.add_argument("--truth-gaf", action="store_true",
                    help="synthesize the GAF from truth walks with deep "
                         "tangle coverage (no aligner in the loop)")
    ap.add_argument("--no-filter", action="store_true",
                    help="search against the FULL aligned read set — "
                         "compute-dominated configuration")
    args = ap.parse_args()

    # prep (align + filter) runs on the default backend (TPU when
    # available); the scaling measurement itself runs in CPU-forced
    # subprocesses
    from gfalign_tpu.cli.main import main as cli_main
    from gfalign_tpu.synth import make_workload, write_workload

    if args.truth_gaf:
        # deep-coverage tangle workload, GAF synthesized from truth walks
        # (no aligner in the loop): thousands of in-tangle reads make the
        # sharded scoring term dominate the fixed per-frontier costs
        wl = make_workload(seed=1, n_segments=args.segments,
                           n_reads=args.reads, tangle_k=8,
                           read_len=(800, 2500), tangle_read_frac=0.7)
        paths = write_workload(wl, args.workdir)
        from gfalign_tpu.synth import write_truth_gaf
        gaf = os.path.join(args.workdir, "truth.gaf")
        write_truth_gaf(wl, gaf)
        filtered = os.path.join(args.workdir, "tangle.gaf")
        import io as _io
        old = sys.stdout
        t0 = time.perf_counter()
        try:
            sys.stdout = _io.StringIO()
            cli_main(["filter", "-g", gaf, "-n", paths["filter_nodelist"],
                      "-o", filtered])
        finally:
            sys.stdout = old
        prep_s = time.perf_counter() - t0
    elif args.reuse:
        d = args.reuse
        wl = make_workload(seed=1, n_segments=args.segments, n_reads=0,
                           tangle_k=8)  # regenerate tangle metadata only
        paths = {"gfa": os.path.join(d, "graph.gfa"),
                 "search_nodelist": os.path.join(d, "search_nodelist.tsv"),
                 "filter_nodelist": os.path.join(d, "filter_nodelist.ls")}
        gaf = os.path.join(d, "align.gaf")
        filtered = os.path.join(d, "tangle.gaf")
        prep_s = 0.0
    else:
        wl = make_workload(seed=1, n_segments=args.segments,
                           n_reads=args.reads, tangle_k=8,
                           read_len=(1000, 4000))
        paths = write_workload(wl, args.workdir)
        gaf = os.path.join(args.workdir, "align.gaf")
        filtered = os.path.join(args.workdir, "tangle.gaf")
        t0 = time.perf_counter()
        import io as _io
        old = sys.stdout
        try:
            sys.stdout = _io.StringIO()
            cli_main(["align", "-f", paths["gfa"], "-r", paths["reads"],
                      "-o", gaf])
            cli_main(["filter", "-g", gaf, "-n", paths["filter_nodelist"],
                      "-o", filtered])
        finally:
            sys.stdout = old
        prep_s = time.perf_counter() - t0
    if args.no_filter:
        filtered = gaf

    script = pathlib.Path(args.workdir) / "worker.py"
    script.write_text(WORKER.format(
        repo=str(ROOT), gfa=paths["gfa"], gaf=filtered,
        nodelist=paths["search_nodelist"], source=wl.source,
        dest=wl.destination, max_steps=args.max_steps))

    t1, e1, h1, p1 = run_procs(1, script)           # 1 proc, 1 core
    tn, en, hn, pn = run_procs(args.procs, script)  # N procs, 1 core each
    t1_free, _, h1f, _ = run_procs(1, script, pin=False)  # 1 proc, all cores
    assert h1 == hn == h1f, "distributed output differs from single-process"
    print(json.dumps({
        "segments": args.segments, "reads": args.reads,
        "filtered_records": sum(1 for _ in open(filtered)),
        "max_steps": args.max_steps, "prep_s": round(prep_s, 1),
        "t_1proc_1core_s": round(t1, 2),
        f"t_{args.procs}proc_s": round(tn, 2),
        "t_1proc_allcores_s": round(t1_free, 2),
        "eval_1proc_s": round(e1, 2), f"eval_{args.procs}proc_s": round(en, 2),
        "walk_1proc_s": round(t1 - e1, 2),
        # the scoring component is what shards; the decision walk is
        # REPLICATED by design (exact output parity on every host)
        "scoring_speedup": round(e1 / en, 3) if en else None,
        "total_speedup_per_core": round(t1 / tn, 3),
        "efficiency": round(t1 / (args.procs * tn), 3),
        "procs": args.procs,
        # native-driver split (search_profile): scoring (eval) shards,
        # ring-wait is communication, commit = replicated walk (Amdahl)
        "profile_1proc": p1,
        f"profile_{args.procs}proc": pn,
    }))


if __name__ == "__main__":
    main()
