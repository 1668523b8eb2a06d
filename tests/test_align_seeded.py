"""Seeded align-mode tests on graphs too large for exhaustive enumeration."""

import random

import pytest

from gfalign_tpu.engine.graph_align import SEED_THRESHOLD, align_reads
from gfalign_tpu.graph.model import Graph, Link
from gfalign_tpu.graph.stats import revcomp


def build_chain_graph(rng, n_segments=200, seg_len=80):
    """Linear backbone with bubble branches — forces the seeded code path."""
    graph = Graph()
    seqs = []
    for i in range(n_segments):
        seq = "".join(rng.choice("ACGT") for _ in range(seg_len))
        graph.add_segment(f"s{i}", seq)
        seqs.append(seq)
        if i > 0:
            graph.links.append(Link(i - 1, "+", i, "+", "0M"))
    return graph, seqs


@pytest.fixture(scope="module")
def chain():
    rng = random.Random(5)
    return build_chain_graph(rng)


def test_seeded_path_used(chain):
    graph, _ = chain
    assert graph.n_segments > SEED_THRESHOLD


def test_seeded_exact_reads(chain):
    graph, seqs = chain
    rng = random.Random(6)
    reads = []
    truths = []
    for i in range(12):
        start_seg = rng.randrange(0, len(seqs) - 3)
        span = rng.randrange(1, 4)
        seq = "".join(seqs[start_seg:start_seg + span])
        reads.append((f"read{i}", seq))
        truths.append((start_seg, span))
    results = align_reads(graph, reads)
    for (name, seq), (start_seg, span), (_, qlen, hits) in zip(reads, truths, results):
        assert hits, f"{name} unaligned"
        best = hits[0]
        assert best.qstart == 0 and best.qend == len(seq)
        assert best.nm == 0 and best.matches == len(seq)
        want_path = "".join(f">s{start_seg + k}" for k in range(span))
        assert best.path_str == want_path, (best.path_str, want_path)


def test_seeded_revcomp_read(chain):
    graph, seqs = chain
    seq = revcomp(seqs[10] + seqs[11])
    results = align_reads(graph, [("rc_read", seq)])
    _, _, hits = results[0]
    assert hits
    assert hits[0].path_str == "<s11<s10"
    assert hits[0].nm == 0


def test_seeded_mutated_read(chain):
    graph, seqs = chain
    rng = random.Random(9)
    seq = list(seqs[50])
    for pos in (10, 40, 70):
        seq[pos] = {"A": "C", "C": "G", "G": "T", "T": "A"}[seq[pos]]
    results = align_reads(graph, [("mut", "".join(seq))])
    _, _, hits = results[0]
    assert hits
    assert hits[0].path_str == ">s50"
    assert hits[0].nm == 3


def test_seeded_junk_read(chain):
    graph, _ = chain
    results = align_reads(graph, [("junk", "A" * 30)])
    _, _, hits = results[0]
    # poly-A junk may seed nowhere; must not crash and must not fake a
    # high-identity hit
    for h in hits:
        assert h.nm > 0 or h.matches < 30 or h.blocklen >= 20


def test_cap_bound_placement_recovered_by_adaptive_retry():
    """A correct placement must not be lost to the default
    MAX_PATHS_PER_ANCHOR bound: a 60-way branch point whose true
    continuation sorts last in adjacency order is invisible to the capped
    first pass; the audit-driven retry with raised caps must recover it,
    and the truncation must be counted (never silent)."""
    rng = random.Random(11)
    graph = Graph()
    a_seq = "".join(rng.choice("ACGT") for _ in range(100))
    graph.add_segment("A", a_seq)
    n_branch = 60
    tails = []
    for i in range(n_branch):
        t = "".join(rng.choice("ACGT") for _ in range(14))  # < k: unanchorable
        tails.append(t)
        graph.add_segment(f"B{i}", t)
        graph.links.append(Link(0, "+", i + 1, "+", "0M"))
    assert graph.n_segments > SEED_THRESHOLD
    true_branch = n_branch - 1                 # last in adjacency order
    read = a_seq + tails[true_branch]

    results = align_reads(graph, [("rd", read)], min_score=10)
    (_, qlen, hits), = results
    assert hits, "read must place"
    covered = sorted((h.qstart, h.qend) for h in hits)
    # the B-tail region must be covered — only reachable past the cap
    assert any(b > 105 for _, b in covered), covered
    assert any(f"B{true_branch}" in h.path_str for h in hits)


def test_anchor_batch_matches_per_read(chain):
    """anchors_with_diag_batch == per-read anchors_with_diag, including
    anchor order, diagonals, tie-extension, and audit tallies."""
    import numpy as np

    from gfalign_tpu.engine.graph_align import CapAudit
    from gfalign_tpu.engine.seeding import KmerIndex, anchors_with_diag_batch
    from gfalign_tpu.io.fastq import encode_seq

    graph, seqs = chain
    rng = random.Random(9)
    reads = []
    for i in range(0, 40, 3):
        seq = (seqs[i] + seqs[i + 1] + seqs[i + 2])[5:190]
        if i % 2:
            seq = revcomp(seq)
        # some noise + one read with Ns, one junk read
        seq = "".join(c if rng.random() > 0.02 else "N" for c in seq)
        reads.append(seq)
    reads.append("N" * 40)
    reads.append("".join(rng.choice("ACGT") for _ in range(60)))
    index = KmerIndex(graph)
    codes = [encode_seq(s) for s in reads]
    audits_b = [CapAudit() for _ in reads]
    batch = anchors_with_diag_batch(index, codes, 4, audits=audits_b)
    for r, c in enumerate(codes):
        audit = CapAudit()
        single = index.anchors_with_diag(c, 4, audit=audit)
        assert batch[r] == single, f"read {r}"
        assert audits_b[r].counts == audit.counts, f"read {r} audit"


def test_kmer_index_vectorized_build_matches_loop():
    """The one-pass concatenated index build == the per-segment loop
    (postings arrays identical, including order)."""
    import numpy as np

    from gfalign_tpu.engine.seeding import KmerIndex, _kmer_codes
    from gfalign_tpu.graph.stats import revcomp
    from gfalign_tpu.io.fastq import encode_seq

    graph, _ = build_chain_graph(random.Random(9), n_segments=8, seg_len=40)
    index = KmerIndex(graph, k=15)
    km, sid, orient, off = [], [], [], []
    for s in range(graph.n_segments):
        seq = graph.segment(s).seq
        if not seq:
            continue
        for oc, q in ((0, seq), (1, revcomp(seq))):
            kms = _kmer_codes(encode_seq(q), 15)
            ok = kms >= 0
            km.append(kms[ok])
            off.append(np.nonzero(ok)[0])
            sid.append(np.full(int(ok.sum()), s))
            orient.append(np.full(int(ok.sum()), oc))
    kms = np.concatenate(km)
    order = np.argsort(kms, kind="stable")
    assert np.array_equal(index.kmers, kms[order])
    assert np.array_equal(index.sids, np.concatenate(sid)[order])
    assert np.array_equal(index.orients, np.concatenate(orient)[order])
    assert np.array_equal(index.offs, np.concatenate(off)[order])


def test_native_kmer_index_matches_numpy(monkeypatch):
    """The native rolling-scan + radix-sort index build produces exactly
    the numpy one-pass build's postings (values AND stable order)."""
    import numpy as np

    from gfalign_tpu.engine.seeding import KmerIndex
    from gfalign_tpu.graph.model import Graph
    from gfalign_tpu.io import native

    if not native.available():
        import pytest
        pytest.skip("native library not built")
    import random
    rng = random.Random(5)
    graph = Graph()
    for i in range(40):
        seq = "".join(rng.choice("ACGTN" if i % 7 == 0 else "ACGT")
                      for _ in range(rng.randrange(5, 120)))
        graph.add_segment(f"s{i}", seq)
    nat = KmerIndex(graph, k=11)
    monkeypatch.setattr(native, "kmer_index_build", lambda *a, **k: None)
    ref = KmerIndex(graph, k=11)
    np.testing.assert_array_equal(nat.kmers, ref.kmers)
    np.testing.assert_array_equal(nat.sids, ref.sids)
    np.testing.assert_array_equal(nat.orients, ref.orients)
    np.testing.assert_array_equal(nat.offs, ref.offs)


def test_native_anchor_votes_bit_exact(chain):
    """The native C++ anchor voter must be bit-exact with the numpy
    pipeline: same anchors, rank order, diagonals, votes, and audit
    tallies (including the vote-tie cap extension)."""
    import unittest.mock as mock

    from gfalign_tpu.engine import seeding
    from gfalign_tpu.engine.graph_align import CapAudit
    from gfalign_tpu.io.fastq import encode_seq

    graph, seqs = chain
    index = seeding.KmerIndex(graph)
    if index.uniq.dtype != __import__("numpy").int32:
        pytest.skip("native index layout unavailable")
    rng = random.Random(9)
    reads = []
    for _ in range(25):
        s = rng.randrange(0, len(seqs) - 3)
        seq = "".join(seqs[s:s + rng.randrange(1, 4)])
        seq = "".join(c if rng.random() > 0.02 else "ACGT"[rng.randrange(4)]
                      for c in seq)
        reads.append(encode_seq(seq))
    reads.append(encode_seq("ACGTN" * 40))   # N-containing
    reads.append(encode_seq("ACG"))          # below k
    for ma in (4, 12):
        a_n = [CapAudit() for _ in reads]
        a_p = [CapAudit() for _ in reads]
        nat = seeding._native_votes(index, reads, ma, a_n)
        assert nat is not None
        with mock.patch.object(seeding, "_native_votes",
                               lambda *a, **k: None):
            py = seeding.anchors_with_diag_batch(index, reads, ma,
                                                 audits=a_p)
        assert nat == py
        assert [a.counts for a in a_n] == [a.counts for a in a_p]


def test_struct_matches_codes_with_sequenceless_segment():
    """build_oriented_struct's lengths must equal the MATERIALIZED code
    array (codes_of / build_oriented_codes), not declared LN lengths: a
    '*' segment contributes zero bytes, and path_len shipped to the
    native banded scorer must match the blob bytes actually written."""
    from gfalign_tpu.engine.graph_align import (_SegCodes,
                                                build_oriented_codes,
                                                build_oriented_struct)
    from gfalign_tpu.graph.model import Graph

    graph = Graph()
    graph.add_segment("a", "ACGTACGT")
    graph.add_segment("b", "*", tags=[("LN", "i", "8")])  # sequence-less
    graph.add_segment("c", "TTTTCCCC")
    steps = [(0, "+"), (1, "+"), (2, "+")]
    op_s = build_oriented_struct(graph, steps, {})
    op_c, codes = build_oriented_codes(graph, steps, {}, _SegCodes(graph))
    assert len(op_s) == len(op_c) == len(codes) == 16
    assert op_s.offsets == op_c.offsets
    assert op_s.seg_lens == op_c.seg_lens
