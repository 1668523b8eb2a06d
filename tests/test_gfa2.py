"""GFA2 dialect parsing + writer round-trips."""

import io

import pytest

from .conftest import REFERENCE

from gfalign_tpu.io.gfa import parse_gfa_lines, read_gfa
from gfalign_tpu.io.writers import write_gfa1, write_gfa2

fixtures = pytest.mark.skipif(not (REFERENCE / "testFiles").is_dir(),
                              reason="reference fixtures not mounted")


@fixtures
def test_gfa2_fixture_parses_like_gfa1():
    g1 = read_gfa(str(REFERENCE / "testFiles" / "random2.gfa"))
    g2 = read_gfa(str(REFERENCE / "testFiles" / "random2.gfa2"))
    assert g2.segment_names() == g1.segment_names()
    assert [(e.s1, e.or1, e.s2, e.or2) for e in g2.links] == \
        [(e.s1, e.or1, e.s2, e.or2) for e in g1.links]
    assert len(g2.gaps) == 2 and g2.gaps[0].dist == 5 and g2.gaps[1].dist == 3
    # the GFA2 file carries only the gapped O path (14), not the P-path 15
    assert len(g2.paths) == 1
    p14 = g2.paths[0]
    assert [g2.segment(s).name + o for s, o in p14.steps] == ["11+", "13-", "12+"]
    assert p14.seps == [("gap", 5), ("gap", 3)]
    # segment sequences identical across dialects
    for name in ("11", "12", "13"):
        assert g2.segment(g2.name_to_id[name]).seq == g1.segment(g1.name_to_id[name]).seq


def _roundtrip(graph, writer):
    buf = io.StringIO()
    writer(graph, buf.write)
    return parse_gfa_lines(buf.getvalue().split("\n"))


@fixtures
def test_writer_roundtrips():
    g = read_gfa(str(REFERENCE / "testFiles" / "random2.gfa"))
    for writer in (write_gfa1, write_gfa2):
        rt = _roundtrip(g, writer)
        assert rt.segment_names() == g.segment_names()
        assert [(e.s1, e.or1, e.s2, e.or2) for e in rt.links] == \
            [(e.s1, e.or1, e.s2, e.or2) for e in g.links]
        assert len(rt.gaps) == len(g.gaps)
        assert len(rt.paths) == len(g.paths)
        for sid in range(g.n_segments):
            assert rt.segment(sid).seq == g.segment(sid).seq
