#!/usr/bin/env python3
"""Distributed align-mode strong-scaling benchmark.

align is ~99% of full-pipeline wall time and is read-index-sharded across
processes (engine/graph_align.align_reads_distributed) — the capability
the reference delegates to a single-host GraphAligner subprocess
(reference src/main.cpp:167-169) with no multi-host story at all.

Measures on a fixed read subset of bench/.workload:
  * t_1proc_1core : one process pinned to core 0, native threads = 1;
  * t_2proc      : two jax.distributed processes, each pinned to its own
                   core (the aligner divides host cores by the co-located
                   process count, so each runs 1 native thread);
  * byte-equality of the two GAFs (the distribution contract).

Strong-scaling efficiency = t_1proc_1core / (procs * t_2proc).  The
replicated serial prefix (graph load + k-mer index build) is also
reported so the Amdahl bound is visible.

Usage: python bench/align_scaling_bench.py [--reads N] [--procs P]
Prints one JSON dict and writes bench/scaling_align.json.
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
import os, sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
if nproc > 1:
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=nproc, process_id=pid)
else:
    from gfalign_tpu.io import native
    native.set_threads(1)
from gfalign_tpu.io.gfa import read_gfa
from gfalign_tpu.io.fastq import load_reads
from gfalign_tpu.engine.graph_align import (PRESETS, align_reads,
                                            align_reads_distributed,
                                            emit_gaf)
t0 = time.perf_counter()
graph = read_gfa({gfa!r})
reads = load_reads([{reads!r}])
params = PRESETS["hifi"]
prep_s = time.perf_counter() - t0
t0 = time.perf_counter()
if nproc > 1:
    text = align_reads_distributed(graph, reads, params, (pid, nproc))
else:
    import io as _io
    buf = _io.StringIO()
    emit_gaf(align_reads(graph, reads, params=params), buf.write)
    text = buf.getvalue()
dt = time.perf_counter() - t0
if pid == 0:
    with open({out!r}, "w") as fh:
        fh.write(text)
    print(f"ALIGN_T {{dt:.3f}} PREP {{prep_s:.3f}}")
"""


def _run(n_procs: int, gfa: str, reads: str, out: str, tmp: pathlib.Path):
    script = tmp / f"worker_{n_procs}.py"
    script.write_text(WORKER.format(repo=str(ROOT), gfa=gfa, reads=reads,
                                    out=out))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    if n_procs > 1:
        env["GFALIGN_TPU_DISTRIBUTED"] = "1"
    procs = []
    for i in range(n_procs):
        cmd = [sys.executable, str(script), str(i), str(n_procs), port]
        if n_procs > 1:
            cmd = ["taskset", "-c", str(i % os.cpu_count())] + cmd
        else:
            cmd = ["taskset", "-c", "0"] + cmd
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                      stderr=subprocess.DEVNULL, text=True,
                                      env=env))
    outs = [p.communicate(timeout=3600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    for line in outs[0].splitlines():
        if line.startswith("ALIGN_T"):
            parts = line.split()
            return float(parts[1]), float(parts[3])
    raise RuntimeError(f"no timing line: {outs}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=400)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--workdir", type=str,
                    default=str(ROOT / "bench" / ".workload"))
    args = ap.parse_args()

    wd = pathlib.Path(args.workdir)
    if not (wd / "reads.fq").is_file() or not (wd / "graph.gfa").is_file():
        # fixtures are generated, not tracked: regenerate (same seed and
        # shape as bench/pipeline_bench.py's default workload)
        from gfalign_tpu.synth import make_workload, write_workload

        print("regenerating workload fixtures...", file=sys.stderr)
        wl = make_workload(seed=1, n_segments=1000, n_reads=10000,
                           tangle_k=8, read_len=(2000, 8000))
        write_workload(wl, str(wd))
    tmp = ROOT / "bench" / ".align_scaling"
    tmp.mkdir(exist_ok=True)
    # fixed read subset
    sub = tmp / "reads_sub.fq"
    with open(wd / "reads.fq") as fh, open(sub, "w") as out:
        for i, line in enumerate(fh):
            if i >= 4 * args.reads:
                break
            out.write(line)

    gfa = str(wd / "graph.gfa")
    out1 = str(tmp / "single.gaf")
    outn = str(tmp / "dist.gaf")
    t1, prep1 = _run(1, gfa, str(sub), out1, tmp)
    tn, prepn = _run(args.procs, gfa, str(sub), outn, tmp)
    same = open(out1, "rb").read() == open(outn, "rb").read()
    eff = t1 / (args.procs * tn)
    res = {
        "reads": args.reads,
        "procs": args.procs,
        "t_1proc_1core_s": round(t1, 2),
        "t_nproc_s": round(tn, 2),
        "prep_1proc_s": round(prep1, 2),
        "reads_per_s_1proc": round(args.reads / t1, 2),
        "reads_per_s_nproc": round(args.reads / tn, 2),
        "speedup": round(t1 / tn, 3),
        "efficiency": round(eff, 3),
        "gaf_byte_equal": same,
    }
    print(json.dumps(res))
    (ROOT / "bench" / "scaling_align.json").write_text(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
