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
shard = (pid, nproc) if nproc > 1 else None
aln.load({gaf!r}, shard=shard, shard_by="qname")
evaluate_fn = None
out = io.StringIO()
if nproc > 1:
    from gfalign_tpu.engine.evaluate import distributed_evaluator
    evaluate_fn = distributed_evaluator()
t0 = time.perf_counter()
search(graph, aln, {nodelist!r}, {source!r}, {dest!r},
       max_steps={max_steps}, out=out, evaluate_fn=evaluate_fn)
dt = time.perf_counter() - t0
print("RESULT", dt)
print("HASH", hash(out.getvalue()), len(out.getvalue()))
"""


def run_procs(n: int, script: pathlib.Path) -> tuple:
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(n), port],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, env=env)
             for i in range(n)]
    outs = [p.communicate(timeout=3600) for p in procs]
    assert all(p.returncode == 0 for p in procs), [o[1][-800:] for o in outs]
    times, hashes = [], []
    for out, _ in outs:
        for ln in out.splitlines():
            if ln.startswith("RESULT"):
                times.append(float(ln.split()[1]))
            if ln.startswith("HASH"):
                hashes.append(ln.split()[1:])
    assert len(set(map(tuple, hashes))) == 1, "processes disagree on output"
    return max(times), hashes[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=1000)
    ap.add_argument("--reads", type=int, default=2000)
    ap.add_argument("--max-steps", type=int, default=2000)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--workdir", type=str, default=str(ROOT / "bench" / ".scaling"))
    args = ap.parse_args()

    # prep (align + filter) runs on the default backend (TPU when
    # available); the scaling measurement itself runs in CPU-forced
    # subprocesses
    from gfalign_tpu.cli.main import main as cli_main
    from gfalign_tpu.synth import make_workload, write_workload

    wl = make_workload(seed=1, n_segments=args.segments, n_reads=args.reads,
                       tangle_k=8, read_len=(1000, 4000))
    paths = write_workload(wl, args.workdir)
    gaf = os.path.join(args.workdir, "align.gaf")
    filtered = os.path.join(args.workdir, "tangle.gaf")
    t0 = time.perf_counter()
    import io as _io
    old = sys.stdout
    try:
        sys.stdout = _io.StringIO()
        cli_main(["align", "-f", paths["gfa"], "-r", paths["reads"], "-o", gaf])
        cli_main(["filter", "-g", gaf, "-n", paths["filter_nodelist"],
                  "-o", filtered])
    finally:
        sys.stdout = old
    prep_s = time.perf_counter() - t0

    script = pathlib.Path(args.workdir) / "worker.py"
    script.write_text(WORKER.format(
        repo=str(ROOT), gfa=paths["gfa"], gaf=filtered,
        nodelist=paths["search_nodelist"], source=wl.source,
        dest=wl.destination, max_steps=args.max_steps))

    t1, h1 = run_procs(1, script)
    tn, hn = run_procs(args.procs, script)
    assert h1 == hn, "distributed output differs from single-process"
    eff = t1 / (args.procs * tn)
    print(json.dumps({
        "segments": args.segments, "reads": args.reads,
        "filtered_records": sum(1 for _ in open(filtered)),
        "max_steps": args.max_steps, "prep_s": round(prep_s, 1),
        "t_1proc_s": round(t1, 2), f"t_{args.procs}proc_s": round(tn, 2),
        "speedup": round(t1 / tn, 3), "efficiency": round(eff, 3),
        "procs": args.procs,
    }))


if __name__ == "__main__":
    main()
