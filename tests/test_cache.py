"""Packed-tensor cache (GFALIGN_TPU_CACHE) round-trip tests."""

import time

import pytest

from .conftest import REFERENCE

from gfalign_tpu.engine.alignments import AlignmentSet
from gfalign_tpu.io import native

pytestmark = [
    pytest.mark.skipif(not (REFERENCE / "testFiles").is_dir(),
                       reason="reference fixtures not mounted"),
    pytest.mark.skipif(not native.available(), reason="native lib unavailable"),
]


def test_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("GFALIGN_TPU_CACHE", str(tmp_path / "cache"))
    path = str(REFERENCE / "testFiles" / "random2.gaf")
    cold = AlignmentSet()
    cold.load(path)
    assert list((tmp_path / "cache").glob("gaf-*.npz"))
    warm = AlignmentSet()
    warm.load(path)
    assert warm.count == cold.count
    assert [warm.line_at(i) for i in range(warm.count)] == \
        [cold.line_at(i) for i in range(cold.count)]
    assert warm.tot_qlen == cold.tot_qlen
    assert (warm.tokens.step_ids == cold.tokens.step_ids).all()
    assert warm.tokens.names == cold.tokens.names


def test_cache_invalidated_on_change(tmp_path, monkeypatch):
    monkeypatch.setenv("GFALIGN_TPU_CACHE", str(tmp_path / "cache"))
    gaf = tmp_path / "x.gaf"
    gaf.write_text("r1\t10\t0\t10\t+\t>a\t10\t0\t10\t10\t10\t60\n")
    a = AlignmentSet()
    a.load(str(gaf))
    assert a.count == 1
    time.sleep(0.01)
    gaf.write_text("r1\t10\t0\t10\t+\t>a\t10\t0\t10\t10\t10\t60\n"
                   "r2\t10\t0\t10\t+\t>b\t10\t0\t10\t10\t10\t60\n")
    b = AlignmentSet()
    b.load(str(gaf))
    assert b.count == 2  # mtime/size key -> stale entry not served
