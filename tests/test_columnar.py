"""Columnar token paths vs per-record Python fallbacks: equivalence on the
reference fixtures and on randomized synthetic GAFs."""

import random

import numpy as np
import pytest

from .conftest import REFERENCE

from gfalign_tpu.engine.alignments import AlignmentSet, build_edge_weights
from gfalign_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def python_set(path: str) -> AlignmentSet:
    """Force the pure-Python loader (no tokens)."""
    from gfalign_tpu.engine.alignments import GafRecord
    from gfalign_tpu.io.stream import iter_lines

    a = AlignmentSet()
    for i, line in enumerate(l for l in iter_lines(path) if l):
        rec = GafRecord.from_line(line, i)
        a.records.append(rec)
        a._accumulate(rec)
    return a


def make_synthetic(tmp_path, n_records=300, n_nodes=20, seed=0):
    rng = random.Random(seed)
    lines = []
    for i in range(n_records):
        steps = "".join(rng.choice("><") + str(rng.randrange(n_nodes))
                        for _ in range(rng.randrange(1, 9)))
        lines.append(f"r{rng.randrange(40)}\t100\t0\t100\t+\t{steps}"
                     f"\t100\t0\t100\t95\t100\t60\tNM:i:5")
    p = tmp_path / "syn.gaf"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


@pytest.fixture()
def synthetic(tmp_path):
    return make_synthetic(tmp_path)


def test_tokens_loaded(synthetic):
    a = AlignmentSet()
    a.load(synthetic)
    assert a.tokens is not None
    assert a.tokens.offsets[-1] == a.tokens.step_ids.size


def test_filter_matches_python(synthetic):
    nodelist = [str(i) for i in range(12)]
    for min_nodes in (0, 2, 5):
        nat = AlignmentSet()
        nat.load(synthetic)
        nat.filter_by_nodelist(nodelist, min_nodes)
        py = python_set(synthetic)
        py.filter_by_nodelist(nodelist, min_nodes)
        assert [r.to_line() for r in nat.records] == [r.to_line() for r in py.records]


def test_sort_keeps_tokens_aligned(synthetic):
    a = AlignmentSet()
    a.load(synthetic)
    a.sort_by_name()
    name_to_id = {str(i): i for i in range(20)}
    ids, orients, lengths = a.paths_padded(name_to_id)
    for i, rec in enumerate(a.records):
        expect = rec.path_ids(name_to_id)
        assert lengths[i] == len(expect)
        got = [(int(ids[i, j]), "+-"[orients[i, j]]) for j in range(len(expect))]
        assert got == expect


def test_edge_weights_match_python(synthetic):
    name_to_id = {str(i): i for i in range(20)}
    nat = AlignmentSet()
    nat.load(synthetic)
    py = python_set(synthetic)
    assert build_edge_weights(nat, name_to_id) == build_edge_weights(py, name_to_id)


def test_edge_weights_match_python_fixtures():
    if not (REFERENCE / "testFiles").is_dir():
        pytest.skip("no fixtures")
    for name in ("random1", "random2", "random3"):
        path = str(REFERENCE / "testFiles" / f"{name}.gaf")
        from gfalign_tpu.io.gfa import read_gfa
        graph = read_gfa(str(REFERENCE / "testFiles" / f"{name}.gfa"))
        nat = AlignmentSet()
        nat.load(path)
        py = python_set(path)
        assert build_edge_weights(nat, graph.name_to_id) == \
            build_edge_weights(py, graph.name_to_id)


def test_paths_padded_matches_python(synthetic):
    name_to_id = {str(i): i for i in range(15)}  # some names unknown -> 0
    nat = AlignmentSet()
    nat.load(synthetic)
    py = python_set(synthetic)
    i1, o1, l1 = nat.paths_padded(name_to_id)
    i2, o2, l2 = py.paths_padded(name_to_id)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(i1[:, :i2.shape[1]], i2)
    np.testing.assert_array_equal(o1[:, :o2.shape[1]], o2)
