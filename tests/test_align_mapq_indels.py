"""align-mode mapq model + indel-containing GAF coordinate conventions.

The reference outsources align mode to GraphAligner (src/main.cpp:167-169);
its bundled fixture GAFs are indel-free and all-mapq-60, so these behaviors
are locked by construction here instead:
  * mapq: 60 for unique placements, scaled down by the best same-query-
    region competitor at a different graph location (engine/graph_align
    _mapq), 0 for an equal-scoring alternative — the multi-mapping model
    the fixed-60 emission lacked;
  * indels: GAF columns obey the format invariants
      qend - qstart = matches + X + I
      pend - pstart = matches + X + D
      blocklen     = matches + X + I + D  (= cg tag length sum)
      NM           = X + I + D
    with coordinates verified against planted mutations.
"""

import io
import random

from gfalign_tpu.engine.graph_align import align_reads, emit_gaf
from gfalign_tpu.graph.model import Graph, Link


def _mkseq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _run(graph, reads):
    results = align_reads(graph, reads)
    buf = io.StringIO()
    emit_gaf(results, buf.write)
    return results, buf.getvalue()


def _cig_counts(cg):
    counts = {"=": 0, "X": 0, "I": 0, "D": 0}
    n = ""
    for ch in cg:
        if ch.isdigit():
            n += ch
        else:
            counts[ch] += int(n)
            n = ""
    return counts


def check_invariants(gaf_text):
    for line in gaf_text.splitlines():
        cols = line.split("\t")
        qstart, qend = int(cols[2]), int(cols[3])
        pstart, pend = int(cols[7]), int(cols[8])
        matches, blocklen, mapq = int(cols[9]), int(cols[10]), int(cols[11])
        tags = dict(t.split(":", 1) for t in cols[12:])
        nm = int(tags["NM"].split(":")[1])
        cg = _cig_counts(tags["cg"].split(":")[1])
        assert cg["="] == matches
        assert qend - qstart == matches + cg["X"] + cg["I"], line
        assert pend - pstart == matches + cg["X"] + cg["D"], line
        assert blocklen == matches + cg["X"] + cg["I"] + cg["D"], line
        assert nm == cg["X"] + cg["I"] + cg["D"], line
        assert 0 <= mapq <= 60


# ---------------------------------------------------------------- mapq


def test_mapq_unique_placement_is_60():
    rng = random.Random(11)
    graph = Graph()
    graph.add_segment("a", _mkseq(rng, 120))
    graph.add_segment("b", _mkseq(rng, 120))
    read = graph.segment(0).seq[10:90]
    results, gaf = _run(graph, [("r", read)])
    _, _, hits = results[0]
    assert hits and hits[0].mapq == 60
    check_invariants(gaf)


def test_mapq_equal_duplicate_segments_is_0():
    """A read matching two identical segments equally is unplaceable:
    score gap 0 -> mapq 0 (the old fixed-60 model claimed certainty)."""
    rng = random.Random(12)
    seq = _mkseq(rng, 120)
    graph = Graph()
    graph.add_segment("copy1", seq)
    graph.add_segment("copy2", seq)
    read = seq[10:90]
    results, gaf = _run(graph, [("r", read)])
    _, _, hits = results[0]
    assert hits
    assert hits[0].mapq == 0
    assert hits[0].s2 == hits[0].score
    check_invariants(gaf)


def test_mapq_near_duplicate_scales_with_gap():
    """A diverged copy competes but loses: 0 < mapq < 60."""
    rng = random.Random(13)
    seq = _mkseq(rng, 150)
    mutated = list(seq)
    for pos in range(5, 150, 10):  # 15 substitutions
        mutated[pos] = {"A": "C", "C": "G", "G": "T", "T": "A"}[mutated[pos]]
    graph = Graph()
    graph.add_segment("true", seq)
    graph.add_segment("copy", "".join(mutated))
    read = seq[5:145]
    results, _ = _run(graph, [("r", read)])
    _, _, hits = results[0]
    assert hits and hits[0].path_str == ">true"
    assert 0 < hits[0].mapq < 60, hits[0]
    assert 0 < hits[0].s2 < hits[0].score


def test_mapq_nested_candidate_paths_not_competitors():
    """Super/sub-paths containing the SAME placement must not count as
    multi-mapping (they trim to the same location)."""
    rng = random.Random(14)
    graph = Graph()
    seqs = [_mkseq(rng, 100) for _ in range(3)]
    for i, s in enumerate(seqs):
        graph.add_segment(f"s{i}", s)
        if i:
            graph.links.append(Link(i - 1, "+", i, "+", "0M"))
    read = seqs[1][5:95]  # interior of the chain: appears in many paths
    results, _ = _run(graph, [("r", read)])
    _, _, hits = results[0]
    assert hits and hits[0].path_str == ">s1"
    assert hits[0].mapq == 60, hits[0]


# ---------------------------------------------------------------- indels


def _chain_graph(rng, n=3, seg_len=120):
    graph = Graph()
    seqs = []
    for i in range(n):
        s = _mkseq(rng, seg_len)
        graph.add_segment(f"s{i}", s)
        seqs.append(s)
        if i:
            graph.links.append(Link(i - 1, "+", i, "+", "0M"))
    return graph, seqs


def test_indel_deletion_coordinates():
    """Read missing 4 graph bases: pend-pstart exceeds qend-qstart by 4."""
    rng = random.Random(21)
    graph, seqs = _chain_graph(rng)
    ref = seqs[0] + seqs[1]
    read = ref[10:100] + ref[104:220]  # 4-base deletion at ref offset 100
    results, gaf = _run(graph, [("del_read", read)])
    check_invariants(gaf)
    _, _, hits = results[0]
    assert len(hits) == 1
    h = hits[0]
    assert (h.qstart, h.qend) == (0, len(read))
    assert (h.pstart, h.pend) == (10, 220)
    assert h.nm == 4 and _cig_counts(h.cigar)["D"] == 4
    assert h.matches >= len(read) - 1  # DP may trade a D placement for a match
    assert h.path_str == ">s0>s1"


def test_indel_insertion_coordinates():
    """Read with 5 inserted bases: qend-qstart exceeds pend-pstart by 5."""
    rng = random.Random(22)
    graph, seqs = _chain_graph(rng)
    ref = seqs[0] + seqs[1]
    read = ref[10:150] + "ACGTA" + ref[150:230]
    results, gaf = _run(graph, [("ins_read", read)])
    check_invariants(gaf)
    _, _, hits = results[0]
    assert len(hits) == 1
    h = hits[0]
    assert (h.qstart, h.qend) == (0, len(read))
    assert (h.pstart, h.pend) == (10, 230)
    assert h.nm >= 5 and "I" in h.cigar
    assert h.pend - h.pstart == (h.qend - h.qstart) - 5


def test_indel_mixed_with_substitutions():
    rng = random.Random(23)
    graph, seqs = _chain_graph(rng)
    ref = seqs[0] + seqs[1] + seqs[2]
    read = list(ref[20:80] + ref[83:160] + "TT" + ref[160:300])
    read[30] = {"A": "C", "C": "G", "G": "T", "T": "A"}[read[30]]
    results, gaf = _run(graph, [("mix", "".join(read))])
    check_invariants(gaf)
    _, _, hits = results[0]
    assert len(hits) == 1
    h = hits[0]
    assert (h.pstart, h.pend) == (20, 300)
    assert h.path_str == ">s0>s1>s2"
    counts = _cig_counts(h.cigar)
    assert counts["D"] == 3 and counts["I"] == 2 and counts["X"] >= 1


def test_indel_spanning_segment_boundary():
    """Deletion straddling a segment junction still trims/attributes the
    covering subpath correctly."""
    rng = random.Random(24)
    graph, seqs = _chain_graph(rng)
    ref = seqs[0] + seqs[1]
    # delete bases 118..122 (last 2 of s0, first 2 of s1)
    read = ref[10:118] + ref[122:230]
    results, gaf = _run(graph, [("bdel", read)])
    check_invariants(gaf)
    _, _, hits = results[0]
    h = hits[0]
    assert h.path_str == ">s0>s1"
    assert (h.pstart, h.pend) == (10, 230)
    assert _cig_counts(h.cigar)["D"] == 4


def test_indel_seeded_mode():
    """The seeded (large-graph) code path reports the same conventions."""
    rng = random.Random(25)
    graph, seqs = _chain_graph(rng, n=80, seg_len=90)
    ref = seqs[40] + seqs[41]
    read = ref[5:60] + ref[63:170]  # 3-base deletion
    results, gaf = _run(graph, [("sdel", read)])
    check_invariants(gaf)
    _, _, hits = results[0]
    assert hits
    h = hits[0]
    assert h.path_str == ">s40>s41"
    assert _cig_counts(h.cigar)["D"] == 3 and h.nm == 3
