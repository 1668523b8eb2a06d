#!/usr/bin/env python3
"""Full-pipeline scale benchmark (BASELINE config 5).

Generates a synthetic assembly-graph workload (gfalign_tpu.synth), then runs
the reference's real workflow end-to-end through the CLI (README.md:33-55):

    align -> evalGFA stats -> filter (tangle window) -> search -> evalPath

and prints one JSON dict with per-stage wall times, throughputs (reads/s for
align, records/s for eval, paths-explored/s for search), and a truth check
(fraction of reads whose best placement touches their sampled walk).

Usage:
    python bench/pipeline_bench.py                # full scale (1k seg / 10k reads)
    python bench/pipeline_bench.py --small        # quick validation instance
    python bench/pipeline_bench.py --segments N --reads R --max-steps M
"""

from __future__ import annotations

import argparse
import io
import json
import os
import pathlib
import re
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

_SEG_RE = re.compile(r"[><]([^><]+)")


def _run_cli(argv, capture=False):
    from gfalign_tpu.cli.main import main

    if not capture:
        return main(argv), None
    old = sys.stdout
    buf = io.StringIO()
    try:
        sys.stdout = buf
        rc = main(argv)
    finally:
        sys.stdout = old
    return rc, buf.getvalue()


def check_truth(gaf_path: str, truth) -> dict:
    """Truth metrics: fraction of reads whose best (first) record's path
    intersects the sampled walk, plus the mapq profile of best records
    (unique placements should sit near the 60 cap; bubbles create the only
    genuine multi-mappings in this workload)."""
    best: dict = {}
    mapqs = []
    with open(gaf_path) as fh:
        for line in fh:
            cols = line.rstrip("\n").split("\t")
            if len(cols) < 12 or cols[0] in best:
                continue
            best[cols[0]] = set(_SEG_RE.findall(cols[5]))
            mapqs.append(int(cols[11]))
    by_name = {t.name: t for t in truth}
    ok = 0
    for name, segs in best.items():
        t = by_name.get(name)
        if t and segs & set(t.walk):
            ok += 1
    mapqs.sort()
    n = len(mapqs)
    return {
        "truth_frac": round(ok / max(1, len(truth)), 4),
        "mapq_median": mapqs[n // 2] if n else None,
        "mapq_ge30_frac": round(sum(q >= 30 for q in mapqs) / n, 4) if n else None,
    }


_DIST_WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
os.environ["GFALIGN_TPU_DISTRIBUTED"] = "1"
from gfalign_tpu.cli.main import main
main(["align", "-f", {gfa!r}, "-r", {reads!r}, "-o", {out!r}])
"""


def _run_distributed_align(gfa: str, reads: str, out: str,
                           n_procs: int, out_dir: str) -> None:
    """N real jax.distributed CLI processes, each pinned to its own core;
    rank 0 writes the gathered input-order GAF to `out`."""
    import socket
    import subprocess

    script = pathlib.Path(out_dir) / "dist_align_worker.py"
    script.write_text(_DIST_WORKER.format(repo=str(ROOT), gfa=gfa,
                                          reads=reads, out=out))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "GFALIGN_TPU_DISTRIBUTED": "1"}
    procs = [subprocess.Popen(
        ["taskset", "-c", str(i % (os.cpu_count() or 1)), sys.executable,
         str(script), str(i), str(n_procs), port],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env)
        for i in range(n_procs)]
    for p in procs:
        p.wait(timeout=7200)
    assert all(p.returncode == 0 for p in procs), \
        [p.returncode for p in procs]


def run_pipeline(out_dir: str, seed: int, n_segments: int, n_reads: int,
                 tangle_k: int, max_steps: int,
                 read_len=(2000, 8000), tangle_budget: int = 2,
                 dist_align: int = 0) -> dict:
    from gfalign_tpu.synth import make_workload, write_workload

    res: dict = {"n_segments": n_segments, "n_reads": n_reads,
                 "tangle_k": tangle_k, "max_steps": max_steps}
    t0 = time.perf_counter()
    wl = make_workload(seed=seed, n_segments=n_segments, n_reads=n_reads,
                       tangle_k=tangle_k, read_len=read_len,
                       tangle_budget=tangle_budget)
    paths = write_workload(wl, out_dir)
    res["gen_s"] = round(time.perf_counter() - t0, 2)
    res["graph_segments"] = wl.graph.n_segments
    res["graph_links"] = len(wl.graph.links)

    gaf = os.path.join(out_dir, "align.gaf")
    t0 = time.perf_counter()
    _run_cli(["align", "-f", paths["gfa"], "-r", paths["reads"], "-o", gaf],
             capture=True)
    dt = time.perf_counter() - t0
    res["align_s"] = round(dt, 2)
    res["align_reads_per_s"] = round(n_reads / dt, 2)
    res["gaf_records"] = sum(1 for _ in open(gaf))
    res.update(check_truth(gaf, wl.truth))

    if dist_align > 1:
        dist_gaf = os.path.join(out_dir, "align_dist.gaf")
        t0 = time.perf_counter()
        _run_distributed_align(paths["gfa"], paths["reads"], dist_gaf,
                               dist_align, out_dir)
        dt = time.perf_counter() - t0
        res["align_dist_procs"] = dist_align
        res["align_dist_s"] = round(dt, 2)
        res["align_dist_reads_per_s"] = round(n_reads / dt, 2)
        res["align_dist_byte_equal"] = (
            open(gaf, "rb").read() == open(dist_gaf, "rb").read())

    t0 = time.perf_counter()
    _rc, stats_out = _run_cli(["evalGFA", "-g", gaf], capture=True)
    dt = time.perf_counter() - t0
    res["evalgfa_s"] = round(dt, 2)
    res["evalgfa_records_per_s"] = round(res["gaf_records"] / dt, 2)

    filtered = os.path.join(out_dir, "tangle.gaf")
    t0 = time.perf_counter()
    _run_cli(["filter", "-g", gaf, "-n", paths["filter_nodelist"],
              "-o", filtered], capture=True)
    res["filter_s"] = round(time.perf_counter() - t0, 2)
    res["filtered_records"] = sum(1 for _ in open(filtered))

    t0 = time.perf_counter()
    _rc, search_out = _run_cli(
        ["search", "-f", paths["gfa"], "-g", filtered,
         "-n", paths["search_nodelist"], "-s", wl.source,
         "-d", wl.destination, "-m", str(max_steps)], capture=True)
    dt = time.perf_counter() - t0
    capped = "Reached maximum number of steps" in search_out
    steps = max_steps if capped else None
    res["search_s"] = round(dt, 2)
    res["search_capped"] = capped
    res["search_rows"] = sum(1 for ln in search_out.splitlines()
                             if ln and not ln.startswith("Reached"))
    if steps:
        res["search_steps_per_s"] = round(steps / dt, 2)
    res["search_top"] = (search_out.splitlines() or [""])[-1 - int(capped)] \
        if search_out.strip() else ""

    # cold run (includes any first-call compile) AND warm repeat, reported
    # separately: r3's evalPath timings swung 0.05 s vs 0.97 s for the
    # same workload because compile time was sometimes included
    t0 = time.perf_counter()
    _rc, ep_out = _run_cli(["evalPath", "-f", paths["gfa"], "-g", filtered,
                            "-p", wl.true_path], capture=True)
    res["evalpath_cold_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    _rc, ep_out = _run_cli(["evalPath", "-f", paths["gfa"], "-g", filtered,
                            "-p", wl.true_path], capture=True)
    res["evalpath_warm_s"] = round(time.perf_counter() - t0, 2)
    res["evalpath_s"] = res["evalpath_warm_s"]
    res["evalpath_last"] = ep_out.strip().splitlines()[-1] if ep_out.strip() else ""
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="quick instance (120 segments / 200 reads)")
    ap.add_argument("--segments", type=int, default=None)
    ap.add_argument("--reads", type=int, default=None)
    ap.add_argument("--tangle-k", type=int, default=8)
    ap.add_argument("--tangle-budget", type=int, default=2)
    ap.add_argument("--max-steps", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--dist-align", type=int, default=0,
                    help="also run align distributed over N processes")
    args = ap.parse_args()
    n_segments = args.segments or (120 if args.small else 1000)
    n_reads = args.reads or (200 if args.small else 10000)
    read_len = (500, 2000) if args.small else (2000, 8000)
    out_dir = args.out or str(ROOT / "bench" / ".workload")
    res = run_pipeline(out_dir, args.seed, n_segments, n_reads,
                       args.tangle_k, args.max_steps, read_len,
                       tangle_budget=args.tangle_budget,
                       dist_align=args.dist_align)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
