"""Tangle-search throughput bench (paths explored / s).

10-node dense tangle, 512 reads (up to 24-step paths), visit budget 2,
400 search steps — the BENCHMARKS.md "Tangle search" workload.  Includes
ALL host work (heap, NodeTable, output) and per-call device dispatch
latency.  Run: PYTHONPATH=/root/repo python bench/search_bench.py
"""

import io
import random
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from gfalign_tpu.engine import search as search_mod
from gfalign_tpu.engine.alignments import AlignmentSet, GafRecord
from gfalign_tpu.graph.model import Graph, Link


def build(seed=3, n_nodes=10, n_reads=512, budget=2):
    rng = random.Random(seed)
    graph = Graph()
    for i in range(n_nodes):
        graph.add_segment(f"n{i}", "A" * 10)
    for i in range(n_nodes):
        for j in range(n_nodes):
            if i != j and rng.random() < 0.6:
                graph.links.append(Link(i, "+", j, "+", "0M"))
    adj = {}
    for l in graph.links:
        adj.setdefault(l.s1, []).append(l.s2)
    alignments = AlignmentSet()
    alignments._records = []
    for r in range(n_reads):
        node = rng.randrange(n_nodes)
        steps = [node]
        for _ in range(rng.randrange(2, 24)):
            nxts = adj.get(steps[-1])
            if not nxts:
                break
            steps.append(rng.choice(nxts))
        path = "".join(f">n{s}" for s in steps)
        line = f"rd{r}\t{len(steps)*10}\t0\t{len(steps)*10}\t+\t{path}" \
               f"\t{len(steps)*10}\t0\t{len(steps)*10}\t{len(steps)*10}" \
               f"\t{len(steps)*10}\t60"
        rec = GafRecord.from_line(line, r)
        alignments._records.append(rec)
        alignments._accumulate(rec)
    node_file = "/tmp/search_bench_nodes.tsv"
    with open(node_file, "w") as fh:
        for i in range(n_nodes):
            fh.write(f"n{i}\t{budget}\n")
    return graph, alignments, node_file


def run(max_steps=400):
    graph, alignments, node_file = build()
    out = io.StringIO()
    t0 = time.perf_counter()
    search_mod.search(graph, alignments, node_file, "n0", "n9",
                      max_steps=max_steps, out=out)
    dt = time.perf_counter() - t0
    return max_steps / dt, out.getvalue()


if __name__ == "__main__":
    rate, text = run(100)       # warm compile caches
    rate, text = run()
    print(f"{rate:.1f} paths/s")
    print(text[-200:])
