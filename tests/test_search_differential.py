"""Differential property test for the search engine: the batched device
scoring path must print byte-identical TSV to a pure-oracle evaluator
(direct per-read NW oracle scoring) across randomized tangles + read sets."""

import io
import random

import pytest

from gfalign_tpu.engine.evaluate import PathScore, filter_mask
from gfalign_tpu.engine.search import search
from gfalign_tpu.graph.model import Graph
from gfalign_tpu.ops.nw_path import Step, nw_score_oracle, revcomp_path


def oracle_evaluator(candidates, read_paths, filter_alignments=True):
    if hasattr(read_paths, "paths"):  # ReadBatch
        read_paths = read_paths.paths
    out = []
    for cand in candidates:
        score = PathScore()
        if filter_alignments:
            keep, score.unaligned = filter_mask(cand, read_paths)
        else:
            keep = [True] * len(read_paths)
        for i, rp in enumerate(read_paths):
            if not keep[i]:
                continue
            best = max(nw_score_oracle(cand, rp),
                       nw_score_oracle(cand, revcomp_path([Step(*s) for s in rp])))
            if best < 0:
                score.bad += 1
            else:
                score.good += 1
        out.append(score)
    return out


def random_tangle(rng, n_nodes):
    """K4-fixture-like tangle: dense forward edges (guarantees source ->
    destination reachability) plus a few random-orientation extras."""
    graph = Graph()
    for i in range(n_nodes):
        graph.add_segment(str(i + 1), "A" * rng.randrange(5, 20))
    from gfalign_tpu.graph.model import Link
    for a in range(n_nodes):
        for b in range(a + 1, n_nodes):
            if rng.random() < 0.7:
                graph.links.append(Link(a, "+", b, "+"))
    for _ in range(rng.randrange(0, n_nodes)):
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        graph.links.append(Link(a, rng.choice("+-"), b, rng.choice("+-")))
    return graph


def random_gaf_file(tmp_path, rng, n_nodes, n_reads, tag):
    lines = []
    for i in range(n_reads):
        steps = "".join(rng.choice("><") + str(rng.randrange(n_nodes) + 1)
                        for _ in range(rng.randrange(1, 6)))
        lines.append(f"rd{i}\t50\t0\t50\t+\t{steps}\t50\t0\t50\t50\t50\t60")
    p = tmp_path / f"reads{tag}.gaf"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _run_differential(seed, tmp_path):
    rng = random.Random(seed)
    n_nodes = rng.randrange(4, 8)
    graph = random_tangle(rng, n_nodes)

    node_file = tmp_path / "nodes.tsv"
    lines = []
    for i in range(2, n_nodes):
        if rng.random() < 0.8:
            lines.append(f"{i}\t{rng.randrange(1, 3)}")
    node_file.write_text("\n".join(lines) + "\n")

    from gfalign_tpu.engine.alignments import AlignmentSet
    gaf = random_gaf_file(tmp_path, rng, n_nodes, rng.randrange(2, 10), seed)
    alignments = AlignmentSet()
    alignments.load(gaf)

    kwargs = dict(node_file=str(node_file), source="1", destination=str(n_nodes),
                  max_steps=500, min_nodes=0,
                  return_all_paths=bool(rng.getrandbits(1)))
    out_batched = io.StringIO()
    search(graph, alignments, out=out_batched, **kwargs)
    out_oracle = io.StringIO()
    search(graph, alignments, out=out_oracle, evaluate_fn=oracle_evaluator, **kwargs)
    assert out_batched.getvalue() == out_oracle.getvalue()
    return len(out_batched.getvalue().splitlines())


@pytest.mark.parametrize("seed", range(8))
def test_search_batched_matches_oracle(seed, tmp_path):
    _run_differential(seed, tmp_path)


def test_differential_seeds_have_coverage(tmp_path):
    """The randomized seeds must actually print search rows (guards against
    the generator silently producing unreachable destinations)."""
    total = 0
    for seed in range(8):
        sub = tmp_path / str(seed)
        sub.mkdir()
        total += _run_differential(seed, sub)
    assert total >= 8
