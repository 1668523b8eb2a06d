#!/usr/bin/env python3
"""10x scale proof (VERDICT r2 item 7): 100k segments / ~100 Mb graph /
100k reads, exercising every host structure the reference's real-world
regime stresses (README.md:33-55):

  gen -> GFA ingest (native columnar parse) -> graph stats -> k-mer index
  build -> align (1k-read subset; the full 100k is wall-bound, the subset
  proves the structures) -> evalGFA stats at 100k records -> 10M-record
  AlignmentSet (load + stats + markDuplicates + filter) -> tangle search.

Prints one JSON dict with per-stage wall seconds and peak RSS.

Usage: python bench/scale10x_bench.py [--segments N] [--reads R]
       [--align-subset A] [--dup-factor F] [--max-steps M]
"""
from __future__ import annotations

import argparse
import io
import json
import os
import pathlib
import resource
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

ap = argparse.ArgumentParser()
ap.add_argument("--segments", type=int, default=100_000)
ap.add_argument("--reads", type=int, default=100_000)
ap.add_argument("--align-subset", type=int, default=1000)
ap.add_argument("--dup-factor", type=int, default=100)
ap.add_argument("--max-steps", type=int, default=20_000)
ap.add_argument("--out-dir", default=str(ROOT / "bench" / ".scale10x"))
args = ap.parse_args()

out: dict = {"segments": args.segments, "reads": args.reads}


def rss_gb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def stage(name):
    t0 = time.perf_counter()

    def done(**extra):
        out[name + "_s"] = round(time.perf_counter() - t0, 2)
        out[name + "_rss_gb"] = rss_gb()
        out.update(extra)
        print(f"[{name}] {out[name + '_s']}s rss={rss_gb()}GB {extra}",
              file=sys.stderr, flush=True)
    return done


def run_cli(argv):
    from gfalign_tpu.cli.main import main

    old = sys.stdout
    buf = io.StringIO()
    try:
        sys.stdout = buf
        main(argv)
    finally:
        sys.stdout = old
    return buf.getvalue()


d = pathlib.Path(args.out_dir)
d.mkdir(parents=True, exist_ok=True)

# ---- gen + write -----------------------------------------------------------
fin = stage("gen")
from gfalign_tpu.synth import make_workload, write_truth_gaf, write_workload  # noqa: E402

wl = make_workload(seed=11, n_segments=args.segments, n_reads=args.reads,
                   tangle_read_frac=0.02)
paths = write_workload(wl, str(d))
write_truth_gaf(wl, str(d / "truth.gaf"))
fin(gfa_mb=round(os.path.getsize(paths["gfa"]) / 1e6, 1),
    read_mb=round(sum(len(s) for _, s in wl.reads) / 1e6, 1))

# ---- GFA ingest (native columnar parse path) + stats -----------------------
fin = stage("ingest")
from gfalign_tpu.io.gfa import read_gfa  # noqa: E402

graph = read_gfa(paths["gfa"])
fin(graph_segments=graph.n_segments, graph_links=len(graph.links))

fin = stage("graph_stats")
from gfalign_tpu.graph.stats import report_stats  # noqa: E402

buf = io.StringIO()
report_stats(graph, buf)
fin()

# ---- k-mer index build -----------------------------------------------------
# production index = what align builds (auto-subsampled at this scale);
# the full unsampled build is also timed as the exhaustive-index proof
fin = stage("kmer_index")
from gfalign_tpu.engine.seeding import KmerIndex  # noqa: E402

total_bases = 2 * sum(len(s) for _, s in wl.segments) \
    if hasattr(wl, "segments") else 0
sample_mod = max(1, -(-os.path.getsize(paths["gfa"]) // 24_000_000))
index = KmerIndex(graph, sample_mod=sample_mod)
fin(kmer_postings=int(len(index.kmers)), kmer_unique=int(len(index.uniq)),
    kmer_sample_mod=sample_mod)
del index

fin = stage("kmer_index_full")
index = KmerIndex(graph)
fin(kmer_full_postings=int(len(index.kmers)))
del index

# ---- align subset ----------------------------------------------------------
fin = stage("align_subset")
sub_fq = d / "reads_subset.fq"
with open(sub_fq, "w") as fh:
    for name, seq in wl.reads[:args.align_subset]:
        fh.write(f"@{name}\n{seq}\n+\n{'~' * len(seq)}\n")
sub_gaf = d / "subset.gaf"
run_cli(["align", "-f", paths["gfa"], "-r", str(sub_fq), "-o", str(sub_gaf)])
n_hits = sum(1 for _ in open(sub_gaf))
fin(align_reads_n=args.align_subset, align_hits=n_hits)
out["align_reads_per_s"] = round(args.align_subset / out["align_subset_s"], 2)

# ---- AlignmentSet at 100k and dup_factor x reads ---------------------------
fin = stage("evalgfa_100k")
run_cli(["evalGFA", "-g", str(d / "truth.gaf")])
fin(gaf_records=args.reads)

big = d / "big.gaf"
fin = stage("big_gaf_write")
with open(d / "truth.gaf", "rb") as f:
    blob = f.read()
with open(big, "wb") as f:
    for _ in range(args.dup_factor):
        f.write(blob)
fin(big_gaf_mb=round(os.path.getsize(big) / 1e6, 1))

fin = stage("big_load_stats")
run_cli(["evalGFA", "-g", str(big)])
fin(big_records=args.reads * args.dup_factor)
out["big_records_per_s"] = round(out["big_records"] / out["big_load_stats_s"])

fin = stage("big_markdup")
from gfalign_tpu.engine.alignments import AlignmentSet  # noqa: E402

aln = AlignmentSet()
aln.load(str(big))
t_md = time.perf_counter()
aln.mark_duplicates()
out["markdup_only_s"] = round(time.perf_counter() - t_md, 2)
fin()
del aln

fin = stage("big_sort")
aln = AlignmentSet()
aln.load(str(big))
t_s = time.perf_counter()
aln.sort_by_name()
out["sort_only_s"] = round(time.perf_counter() - t_s, 2)
fin()
del aln

fin = stage("big_filter")
filtered = d / "big_tangle.gaf"
# op-only split: the stage wall includes the (shared) load; the
# filter itself is the vectorized membership + emission
aln = AlignmentSet()
aln.load(str(big))
t_f = time.perf_counter()
aln.filter_by_nodelist([ln.split("\t")[0] for ln in
                        open(paths["filter_nodelist"]).read().splitlines()
                        if ln], 0)
out["filter_only_s"] = round(time.perf_counter() - t_f, 2)
del aln
run_cli(["filter", "-g", str(big), "-n", paths["filter_nodelist"],
         "-o", str(filtered)])
fin(big_filtered=sum(1 for _ in open(filtered)))

# ---- tangle search ---------------------------------------------------------
fin = stage("search")
small_tangle = d / "tangle.gaf"
run_cli(["filter", "-g", str(d / "truth.gaf"), "-n",
         paths["filter_nodelist"], "-o", str(small_tangle)])
search_out = run_cli(
    ["search", "-f", paths["gfa"], "-g", str(small_tangle),
     "-n", paths["search_nodelist"], "-s", wl.source,
     "-d", wl.destination, "-m", str(args.max_steps)])
capped = "Reached maximum number of steps" in search_out
fin(search_rows=sum(1 for ln in search_out.splitlines()
                    if ln and not ln.startswith("Reached")),
    search_capped=capped)
if capped:
    out["search_steps_per_s"] = round(args.max_steps / out["search_s"], 1)

print(json.dumps(out))
