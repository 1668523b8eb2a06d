"""align-mode golden tests: the in-house aligner must reproduce the
reference's bundled GAF files (which are aligner outputs for the bundled
read sets) byte-for-byte, plus robustness probes."""

import io

import pytest

from .conftest import REFERENCE

pytestmark = pytest.mark.skipif(not (REFERENCE / "testFiles").is_dir(),
                                reason="reference fixtures not mounted")


def run_align(gfa, fq):
    from gfalign_tpu.engine.graph_align import align_reads, emit_gaf
    from gfalign_tpu.io.fastq import load_reads
    from gfalign_tpu.io.gfa import read_gfa

    graph = read_gfa(str(gfa))
    reads = load_reads(str(fq))
    results = align_reads(graph, reads)
    buf = io.StringIO()
    emit_gaf(results, buf.write)
    return buf.getvalue()


@pytest.mark.parametrize("name", ["random1", "random2"])
def test_align_reproduces_reference_gaf(name):
    got = run_align(REFERENCE / "testFiles" / f"{name}.gfa",
                    REFERENCE / "testFiles" / f"{name}.reads.fq")
    want = (REFERENCE / "testFiles" / f"{name}.gaf").read_text()
    assert got == want


def test_align_no_spurious_hits(tmp_path):
    fq = tmp_path / "junk.fq"
    fq.write_text("@junk\n" + "A" * 5 + "\n+\n" + "!" * 5 + "\n")
    got = run_align(REFERENCE / "testFiles" / "random2.gfa", fq)
    assert got == ""  # below min score -> no records


def test_align_read_with_n(tmp_path):
    # seg11 with two N's: still one full-length placement on >11
    from gfalign_tpu.io.gfa import read_gfa
    graph = read_gfa(str(REFERENCE / "testFiles" / "random2.gfa"))
    seq = list(graph.segment(graph.name_to_id["11"]).seq)
    seq[10] = "N"
    seq[30] = "N"
    fq = tmp_path / "n.fq"
    fq.write_text("@nn\n" + "".join(seq) + "\n+\n" + "!" * len(seq) + "\n")
    got = run_align(REFERENCE / "testFiles" / "random2.gfa", fq)
    lines = [l for l in got.splitlines() if l]
    assert len(lines) == 1
    cols = lines[0].split("\t")
    assert cols[5] == ">11" and cols[12] == "NM:i:2"


def test_seqalign_pallas_interpret_matches_xla():
    """Anti-diagonal Pallas local-alignment forward (interpret mode) is
    bit-exact with the XLA row kernel, including end-cell tie-breaking."""
    import numpy as np
    from gfalign_tpu.ops.seqalign import PAD, _jitted_forward
    from gfalign_tpu.ops.seqalign_pallas import local_forward_pallas

    rng = np.random.default_rng(3)
    R, Lr, P, Lp = 16, 32, 4, 48
    reads = np.full((R, Lr), PAD, dtype=np.int8)
    for i in range(R):
        length = rng.integers(8, Lr + 1)
        reads[i, :length] = rng.integers(0, 5, length)  # incl. N
    paths = np.full((P, Lp), PAD, dtype=np.int8)
    for i in range(P):
        length = rng.integers(16, Lp + 1)
        paths[i, :length] = rng.integers(0, 4, length)
    paths[0, 3:19] = reads[0, :16]  # plant a hit
    xla = _jitted_forward()
    b1, i1, j1 = [np.asarray(x) for x in xla(reads, paths)]
    b2, i2, j2 = local_forward_pallas(reads, paths, interpret=True)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(j1, j2)


def test_seqalign_pallas_pairwise_interpret_matches_xla():
    """Pairwise Pallas mode (per-lane paths) is bit-exact with the XLA
    pairwise row kernel — this is the seeded align mode's hot path."""
    import numpy as np
    from gfalign_tpu.ops.seqalign import PAD, _jitted_forward_pairs
    from gfalign_tpu.ops.seqalign_pallas import local_forward_pairs_pallas

    rng = np.random.default_rng(4)
    N, Lr, Lp = 24, 40, 56
    reads = np.full((N, Lr), PAD, dtype=np.int8)
    paths = np.full((N, Lp), PAD, dtype=np.int8)
    for i in range(N):
        rl = rng.integers(8, Lr + 1)
        pl = rng.integers(12, Lp + 1)
        reads[i, :rl] = rng.integers(0, 5, rl)
        paths[i, :pl] = rng.integers(0, 4, pl)
        if i % 3 == 0:  # plant hits at varying offsets
            k = min(rl, pl - 2)
            paths[i, 2:2 + k] = reads[i, :k] % 4
            reads[i, :k] = reads[i, :k] % 4
    xla = _jitted_forward_pairs()
    b1, i1, j1 = [np.asarray(x) for x in xla(reads, paths)]
    b2, i2, j2 = local_forward_pairs_pallas(reads, paths, interpret=True)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(j1, j2)


def test_seqalign_forward_matches_matrix_oracle():
    """The device forward's (best, end cell) equals an explicit numpy-DP
    argmax with the documented tie-break (max value, min end row, min end
    column) — ties XLA (and transitively Pallas) to the traceback oracle."""
    import numpy as np
    from gfalign_tpu.ops.seqalign import PAD, _jitted_forward, _matrix

    rng = np.random.default_rng(8)
    xla = _jitted_forward()
    for trial in range(25):
        Lr = int(rng.integers(1, 60))
        Lp = int(rng.integers(1, 80))
        read = rng.integers(0, 6, size=Lr).astype(np.int8)
        path = rng.integers(0, 6, size=Lp).astype(np.int8)
        if trial % 2:
            k = min(Lr, Lp) - 1
            path[:k] = read[:k] % 4
            read[:k] = read[:k] % 4
        b, bi, bj = [int(np.asarray(x)[0, 0])
                     for x in xla(read[None, :], path[None, :])]
        H = _matrix(read, path)
        assert b == int(H.max())
        if b > 0:
            rows, cols = np.nonzero(H == b)
            want_i = int(rows.min())
            want_j = int(cols[rows == want_i].min())
            assert (bi, bj) == (want_i, want_j), (trial, b, bi, bj)
        else:
            assert (bi, bj) == (0, 0)
