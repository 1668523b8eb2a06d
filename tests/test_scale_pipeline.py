"""End-to-end pipeline on a synthetic scale workload (BASELINE config 5,
small instance): align -> evalGFA -> filter -> search -> evalPath through
the CLI, with truth validation.  The full-scale numbers live in
BENCHMARKS.md (bench/pipeline_bench.py)."""

import importlib.util
import pathlib
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "pipeline_bench", ROOT / "bench" / "pipeline_bench.py")
pipeline_bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pipeline_bench)


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    out = tmp_path_factory.mktemp("workload")
    return pipeline_bench.run_pipeline(
        str(out), seed=1, n_segments=100, n_reads=60, tangle_k=8,
        max_steps=2000, read_len=(500, 2000))


def test_workload_generation_is_deterministic():
    from gfalign_tpu.synth import make_workload

    a = make_workload(seed=7, n_segments=30, n_reads=5)
    b = make_workload(seed=7, n_segments=30, n_reads=5)
    assert a.reads == b.reads
    assert [s.name for s in a.graph.segments] == [s.name for s in b.graph.segments]
    c = make_workload(seed=8, n_segments=30, n_reads=5)
    assert a.reads != c.reads


def test_align_places_reads_correctly(result):
    assert result["gaf_records"] >= result["n_reads"] * 0.95
    assert result["truth_frac"] >= 0.95


def test_filter_keeps_tangle_window_reads(result):
    assert 0 < result["filtered_records"] < result["gaf_records"]


def test_search_explores_tangle_and_finds_backbone_path(result):
    assert result["search_capped"], "tangle must sustain the step budget"
    assert result["search_rows"] >= 1
    # best improving row ends with the true backbone walk through the tangle
    top = result["search_top"].split("\t")
    assert top[-1] == "47+,48+,49+,50+,51+,52+,53+,54+"
    assert top[-2] == "F"  # source/dest absent from node file => quirk 3


def test_evalpath_scores_true_path(result):
    # "bad good alt size uniques" for the true 8-node tangle walk
    cols = result["evalpath_last"].split("\t")
    assert len(cols) == 5
    assert cols[3] == "8" and cols[4] == "8"
