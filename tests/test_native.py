"""Native C++ loader vs pure-Python parser equality."""

import numpy as np
import pytest

from .conftest import REFERENCE

from gfalign_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

fixtures = pytest.mark.skipif(not (REFERENCE / "testFiles").is_dir(),
                              reason="reference fixtures not mounted")


@fixtures
@pytest.mark.parametrize("name", ["random1", "random2", "random3"])
def test_native_gaf_matches_python(name):
    from gfalign_tpu.engine.alignments import AlignmentSet, GafRecord
    from gfalign_tpu.io.stream import iter_lines

    path = str(REFERENCE / "testFiles" / f"{name}.gaf")
    numeric, qnames, paths, tails = native.parse_gaf(path)
    py_records = [GafRecord.from_line(l) for l in iter_lines(path) if l]
    assert len(qnames) == len(py_records)
    for i, rec in enumerate(py_records):
        assert qnames[i] == rec.qname
        assert paths[i] == rec.path
        assert tails[i] == rec.tagtail
        row = numeric[i]
        assert [int(v) for v in row] == [
            rec.qlen, rec.qstart, rec.qend, 0 if rec.strand == "+" else 1,
            rec.plen, rec.pstart, rec.pend, rec.matches, rec.blocklen, rec.mapq]

    # AlignmentSet native fast path produces identical records + stats
    a_native = AlignmentSet()
    a_native.load(path)
    a_py = AlignmentSet()
    for i, line in enumerate(l for l in iter_lines(path) if l):
        rec = GafRecord.from_line(line, i)
        a_py.records.append(rec)
        a_py._accumulate(rec)
    assert [r.to_line() for r in a_native.records] == [r.to_line() for r in a_py.records]
    for attr in ("tot_qlen", "tot_algseq", "tot_plus", "tot_minus", "tot_plen",
                 "tot_mapq", "tot_matches", "tot_blocklen"):
        assert getattr(a_native, attr) == getattr(a_py, attr), attr


@fixtures
@pytest.mark.parametrize("name", ["random1", "random2"])
def test_native_fastq_matches_python(name):
    from gfalign_tpu.io.fastq import iter_reads

    path = str(REFERENCE / "testFiles" / f"{name}.reads.fq")
    assert native.parse_fastx(path) == list(iter_reads(path))


def test_native_fasta(tmp_path):
    fa = tmp_path / "x.fa"
    fa.write_text(">a desc\nACGT\nTTGG\n>b\nCCC\n")
    assert native.parse_fastx(str(fa)) == [("a desc", "ACGTTTGG"), ("b", "CCC")]


def test_native_missing_file():
    assert native.parse_gaf("/nonexistent/x.gaf") is None


def test_native_traceback_matches_python():
    """C++ seq_local_traceback is bit-equal to the Python oracle on random
    pairs covering N codes, PAD blocks, indels, and partial end cells."""
    from gfalign_tpu.ops import seqalign

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    for trial in range(120):
        lr = int(rng.integers(1, 100))
        lp = int(rng.integers(1, 140))
        read = rng.integers(0, 6, size=lr).astype(np.int8)  # incl N(4), PAD(5)
        path = rng.integers(0, 6, size=lp).astype(np.int8)
        if trial % 3 == 0 and lr > 10:  # embed a real match: long walks
            k = min(lr, lp) - 1
            path[:k] = read[:k] % 4
            read[:k] = read[:k] % 4
        ei = int(rng.integers(0, lr + 1))
        ej = int(rng.integers(0, lp + 1))
        assert (seqalign.traceback(read, path, ei, ej)
                == seqalign._traceback_py(read, path, ei, ej))


def test_stale_library_degrades_gracefully(tmp_path, monkeypatch):
    """A stale .so missing newer symbols must not crash _load(): it triggers
    one forced rebuild, and if the path is still stale, falls back to None
    (pure-Python paths) instead of raising AttributeError."""
    import subprocess

    src = tmp_path / "stale.c"
    src.write_text("int gaf_unrelated(void){return 0;}\n")
    so = tmp_path / "libgfalign_host.so"
    subprocess.run(["gcc", "-shared", "-fPIC", "-o", str(so), str(src)],
                   check=True)

    monkeypatch.setattr(native, "_LIB_PATH", so)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    rebuilds = []
    monkeypatch.setattr(native, "_rebuild",
                        lambda force: rebuilds.append(force) or True)
    assert native._load() is None          # no AttributeError escape
    assert rebuilds == [True]              # one forced rebuild was attempted
    assert native.parse_gaf("/nonexistent") is None
    assert native.local_traceback(
        np.zeros(1, np.int8), np.zeros(1, np.int8), 0, 0, 1, -1, -1, 5, 4) is None


def test_nw_path_walk_matches_oracle():
    """Native nw_path_traceback == nw_align_oracle: identical
    walk-recomputed score and identical printed alignment row."""
    import random

    from gfalign_tpu.engine.evaluate import (_alignment_string,
                                             _alignment_string_from_ops)
    from gfalign_tpu.ops.nw_path import ORIENT_CODE, Step, nw_align_oracle

    rng = random.Random(2)
    id2n = lambda i: f"s{i}"
    for trial in range(200):
        n, m = rng.randrange(1, 30), rng.randrange(1, 30)
        a = [Step(rng.randrange(6), rng.choice("+-")) for _ in range(n)]
        b = [Step(rng.randrange(6), rng.choice("+-")) for _ in range(m)]
        if trial % 2:
            b = list(a[:m]) or b
            for k in range(len(b)):
                if rng.random() < 0.2:
                    b[k] = Step(rng.randrange(6), rng.choice("+-"))
        oracle = nw_align_oracle(a, b)
        ak = np.array([s.id * 4 + ORIENT_CODE[s.orientation] for s in a], np.int64)
        bk = np.array([s.id * 4 + ORIENT_CODE[s.orientation] for s in b], np.int64)
        score, ops = native.nw_path_walk(ak, bk)
        assert score == oracle.score
        assert (_alignment_string_from_ops(a, b, ops, id2n)
                == _alignment_string(oracle.a, oracle.b, id2n))


def _graph_fingerprint(g):
    return (
        [(s.name if s else None, s.seq if s else None,
          s.length if s else None, tuple(s.tags) if s else None)
         for s in g.segments],
        dict(g.name_to_id),
        [(e.s1, e.or1, e.s2, e.or2, e.overlap, tuple(e.tags))
         for e in g.links],
        [(x.gid, x.s1, x.or1, x.s2, x.or2, x.dist, tuple(x.tags))
         for x in g.gaps],
        [(p.name, tuple(p.steps), tuple(p.seps)) for p in g.paths],
        list(g.header_tags),
    )


@pytest.mark.parametrize("name", ["random1.gfa", "random2.gfa",
                                  "random3.gfa", "random2.gfa2"])
def test_native_gfa_matches_python(name):
    from gfalign_tpu.io.gfa import _read_gfa_native, parse_gfa_lines
    from gfalign_tpu.io.stream import iter_lines

    path = REFERENCE / "testFiles" / name
    if not path.exists():
        pytest.skip("fixture not mounted")
    got = _read_gfa_native(str(path))
    if got is None:
        pytest.skip("native library unavailable")
    want = parse_gfa_lines(iter_lines(str(path)))
    # force lazy segment materialization on both sides
    for g in (got, want):
        for sid in range(g.n_segments):
            g.segment(sid)
    assert _graph_fingerprint(got) == _graph_fingerprint(want)


def test_native_gfa_fuzz_matches_python(tmp_path):
    import random

    from gfalign_tpu.io.gfa import _read_gfa_native, parse_gfa_lines
    from tests.test_gfa_fuzz import random_gfa

    for seed in range(12):
        rng = random.Random(1000 + seed)
        lines = random_gfa(rng)
        # pad past the 1 MB single-chunk threshold on some seeds so the
        # threaded chunk/merge path is exercised too
        if seed % 3 == 0:
            filler = "".join(rng.choice("ACGT") for _ in range(1200))
            lines += [f"S\tbig{i}\t{filler}" for i in range(1200)]
        p = tmp_path / f"fz{seed}.gfa"
        p.write_text("\n".join(lines) + "\n")
        got = _read_gfa_native(str(p))
        if got is None:
            pytest.skip("native library unavailable")
        want = parse_gfa_lines(lines)
        for g in (got, want):
            for sid in range(g.n_segments):
                g.segment(sid)
        assert _graph_fingerprint(got) == _graph_fingerprint(want), seed


def test_native_gz_inputs_match_plain(tmp_path):
    """gz GFA/GAF go through the native loader (in-memory inflate) and
    produce byte-identical results to the plain files (gfalibs StreamObj
    parity, reference src/input-gfalign.cpp:42)."""
    import gzip
    import shutil

    from gfalign_tpu.engine.alignments import AlignmentSet
    from gfalign_tpu.io.gfa import read_gfa

    ref = "/root/reference/testFiles"
    for base in ("random2.gfa", "random2.gaf"):
        src = f"{ref}/{base}"
        dst = tmp_path / (base + ".gz")
        with open(src, "rb") as fi, gzip.open(dst, "wb") as fo:
            shutil.copyfileobj(fi, fo)
    g_plain = read_gfa(f"{ref}/random2.gfa")
    g_gz = read_gfa(str(tmp_path / "random2.gfa.gz"))
    assert [s.name for s in g_plain.segments] == [s.name for s in g_gz.segments]
    assert [s.seq for s in g_plain.segments] == [s.seq for s in g_gz.segments]
    assert len(g_plain.links) == len(g_gz.links)
    a_plain = AlignmentSet(); a_plain.load(f"{ref}/random2.gaf")
    a_gz = AlignmentSet(); a_gz.load(str(tmp_path / "random2.gaf.gz"))
    assert a_plain.count == a_gz.count
    assert all(a_plain.line_at(i) == a_gz.line_at(i)
               for i in range(a_plain.count))
    # the gz load must have taken the columnar path (tokens present)
    assert a_gz.tokens is not None


def test_search_profile_counters_accumulate_and_reset():
    """search_profile() reports driver/eval time accumulated since the
    last call and resets on read (the scaling bench's split source)."""
    import io

    from gfalign_tpu.engine.alignments import AlignmentSet
    from gfalign_tpu.engine.search import search
    from gfalign_tpu.io import native
    from gfalign_tpu.io.gfa import read_gfa

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    from .conftest import REFERENCE
    tf = REFERENCE / "testFiles"
    if not tf.is_dir():
        import pytest
        pytest.skip("reference fixtures not mounted")
    native.search_profile()  # reset
    graph = read_gfa(str(tf / "random3.gfa"))
    aln = AlignmentSet()
    aln.load(str(tf / "random3.gaf"))
    buf = io.StringIO()
    search(graph, aln, str(tf / "random3.search_nodelist.tsv"), "1", "4",
           out=buf)
    total, ev, wait, waits = native.search_profile()
    assert total > 0 and ev >= 0 and wait == 0 and waits == 0
    # second read: counters were reset
    total2, ev2, _, _ = native.search_profile()
    assert total2 == 0 and ev2 == 0
