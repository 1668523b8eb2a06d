"""Cross-validation of the batched JAX NW path scorer against the exact
reference-semantics oracle (which is itself a semantic transcription of
reference src/alignments.cpp:499-554 + src/eval.cpp:79-98)."""

import random

import numpy as np
import pytest

from gfalign_tpu.ops.nw_path import (
    Step,
    batched_best_scores,
    nw_align_oracle,
    nw_score_oracle,
    revcomp_path,
)


def random_path(rng, max_nodes, max_len):
    return [Step(rng.randrange(max_nodes), rng.choice("+-"))
            for _ in range(rng.randrange(1, max_len))]


def test_perfect_match_scores_zero():
    p = [Step(1, "+"), Step(2, "-"), Step(3, "+")]
    assert nw_score_oracle(p, p) == 0


def test_contained_read_is_free():
    cand = [Step(i, "+") for i in range(6)]
    read = [Step(2, "+"), Step(3, "+")]
    # leading candidate overhang free (dp col 0 = 0), trailing candidate
    # overhang free during traceback (sblen-gated)
    assert nw_score_oracle(cand, read) == 0


def test_mismatch_costs():
    cand = [Step(1, "+"), Step(2, "+")]
    read = [Step(1, "+"), Step(9, "+")]
    assert nw_score_oracle(cand, read) < 0


def test_orientation_matters():
    a = [Step(1, "+")]
    b = [Step(1, "-")]
    assert nw_score_oracle(a, a) == 0
    assert nw_score_oracle(a, b) < 0


def test_revcomp_matches_reversed_candidate():
    cand = [Step(1, "+"), Step(2, "+"), Step(3, "+")]
    read = [Step(3, "-"), Step(2, "-"), Step(1, "-")]
    assert revcomp_path(read) == cand
    assert max(nw_score_oracle(cand, read), nw_score_oracle(cand, revcomp_path(read))) == 0


@pytest.mark.parametrize("seed", range(6))
def test_batched_matches_oracle(seed):
    rng = random.Random(seed)
    n_candidates = rng.randrange(1, 5)
    n_reads = rng.randrange(1, 12)
    candidates = [random_path(rng, 8, 12) for _ in range(n_candidates)]
    reads = [random_path(rng, 8, 14) for _ in range(n_reads)]
    got = batched_best_scores(candidates, reads)
    want = np.array([
        [max(nw_score_oracle(c, r), nw_score_oracle(c, revcomp_path([Step(*s) for s in r])))
         for r in reads]
        for c in candidates
    ], dtype=np.int32)
    np.testing.assert_array_equal(got, want)


def test_batched_chunking():
    rng = random.Random(99)
    candidates = [random_path(rng, 6, 10) for _ in range(3)]
    reads = [random_path(rng, 6, 10) for _ in range(40)]
    full = batched_best_scores(candidates, reads, read_chunk=512)
    chunked = batched_best_scores(candidates, reads, read_chunk=8)
    np.testing.assert_array_equal(full, chunked)


def test_alignment_rows_pair_up():
    cand = [Step(1, "+"), Step(2, "+"), Step(3, "+")]
    read = [Step(1, "+"), Step(3, "+")]
    aln = nw_align_oracle(cand, read)
    assert len(aln.a) == len(aln.b)
    # every read step appears in order in the B row
    b_real = [s for s in aln.b if s.id != -1]
    assert b_real == read


def test_pallas_kernel_interpret_matches_xla():
    """The anti-diagonal Pallas forward (interpret mode on CPU) is bit-exact
    with the XLA row formulation."""
    import numpy as np
    from gfalign_tpu.ops.nw_path import encode_path_batch, nw_pair_scores
    from gfalign_tpu.ops.nw_pallas import TILE_R, nw_pair_scores_pallas

    rng = random.Random(42)
    C, n, m = 3, 12, 12
    cands = [[Step(rng.randrange(5), rng.choice("+-"))
              for _ in range(rng.randrange(1, n + 1))] for _ in range(C)]
    reads = [[Step(rng.randrange(5), rng.choice("+-"))
              for _ in range(rng.randrange(1, m + 1))] for _ in range(TILE_R)]
    a_keys, a_len = encode_path_batch(cands, n, pad_key=-1)
    b_keys, b_len = encode_path_batch(reads, m, pad_key=-2)
    ref = np.asarray(nw_pair_scores(a_keys, a_len, b_keys, b_len))
    got = np.asarray(nw_pair_scores_pallas(a_keys, a_len, b_keys, b_len,
                                           interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_pallas_packed_kernel_matches_unpacked():
    """The packed-carry kernel (dp | prio | exit-column in one int32) is
    bit-exact vs the unpacked kernel and the XLA scorer, including the
    free-last-column priority flip and padding lanes (interpret mode)."""
    from gfalign_tpu.ops import nw_pallas
    from gfalign_tpu.ops.nw_path import nw_best_scores

    rng = np.random.default_rng(11)
    C, n, R, m = 8, 24, 128, 16
    a_keys = (rng.integers(0, 10, (C, n)) * 4
              + rng.integers(0, 2, (C, n))).astype(np.int32)
    a_len = rng.integers(0, n + 1, (C,)).astype(np.int32)
    for c in range(C):
        a_keys[c, a_len[c]:] = -1
    b_keys = (rng.integers(0, 10, (R, m)) * 4
              + rng.integers(0, 2, (R, m))).astype(np.int32)
    b_len = rng.integers(0, m + 1, (R,)).astype(np.int32)
    for r in range(R):
        b_keys[r, b_len[r]:] = -2
    want = np.asarray(nw_best_scores(a_keys, a_len, b_keys, b_len))
    for packed in (False, True):
        nw_pallas._build_pallas_forward.cache_clear()
        fwd_builder = nw_pallas._build_pallas_forward
        import functools as _ft
        orig = fwd_builder.__wrapped__
        got = None
        try:
            nw_pallas._build_pallas_forward = _ft.lru_cache(maxsize=None)(
                lambda nn, mm, interpret=False, _p=packed: orig(
                    nn, mm, interpret, packed=_p))
            got = np.asarray(nw_pallas.nw_best_scores_pallas(
                a_keys, a_len, b_keys, b_len, interpret=True))
        finally:
            nw_pallas._build_pallas_forward = fwd_builder
        assert np.array_equal(want, got), f"packed={packed}"


@pytest.mark.parametrize("seed", range(8))
def test_native_batch_matches_oracle(seed):
    """The native C++ batch scorer (CPU search fast path) is bit-exact vs
    the reference-transcribed oracle, fw and rc included."""
    from gfalign_tpu.io import native
    from gfalign_tpu.ops.nw_path import encode_path_batch

    if not native.available():
        pytest.skip("native library not built")
    rng = random.Random(1000 + seed)
    candidates = [random_path(rng, 6, 14) for _ in range(rng.randrange(1, 7))]
    reads = [random_path(rng, 8, 16) for _ in range(rng.randrange(1, 14))]
    n_max = max(len(c) for c in candidates)
    m_max = max((len(r) for r in reads), default=1)
    a_keys, a_len = encode_path_batch(candidates, max(n_max, 1), pad_key=-1)
    b_keys, b_len = encode_path_batch(reads, max(m_max, 1), pad_key=-2)
    got = native.nw_best_scores_batch(a_keys, a_len, b_keys, b_len)
    want = np.array([
        [max(nw_score_oracle(c, r),
             nw_score_oracle(c, revcomp_path([Step(*s) for s in r])))
         for r in reads]
        for c in candidates
    ], dtype=np.int32)
    np.testing.assert_array_equal(got, want)


def test_native_batch_threads_match_single():
    from gfalign_tpu.io import native
    from gfalign_tpu.ops.nw_path import encode_path_batch

    if not native.available():
        pytest.skip("native library not built")
    rng = random.Random(7)
    candidates = [random_path(rng, 30, 40) for _ in range(64)]
    reads = [random_path(rng, 20, 40) for _ in range(64)]
    a_keys, a_len = encode_path_batch(candidates, 40, pad_key=-1)
    b_keys, b_len = encode_path_batch(reads, 40, pad_key=-2)
    native.set_threads(4)
    try:
        multi = native.nw_best_scores_batch(a_keys, a_len, b_keys, b_len)
    finally:
        native.set_threads(1)
    single = native.nw_best_scores_batch(a_keys, a_len, b_keys, b_len)
    native.set_threads(0)
    np.testing.assert_array_equal(multi, single)


@pytest.mark.parametrize("seed", range(6))
def test_native_frontier_matches_python(seed, monkeypatch):
    """The fused native evaluate (filter + score + tally) equals the
    Python/XLA evaluate_candidates path, both filter modes."""
    from gfalign_tpu.engine import evaluate as ev
    from gfalign_tpu.io import native

    if not native.available():
        pytest.skip("native library not built")
    rng = random.Random(2000 + seed)
    candidates = [random_path(rng, 6, 10) for _ in range(rng.randrange(1, 9))]
    reads = [random_path(rng, 8, 12) for _ in range(rng.randrange(1, 20))]
    for filt in (True, False):
        got = ev.evaluate_candidates(candidates, reads, filt)
        monkeypatch.setattr(ev, "_native_scoring_ok", lambda: False)
        want = ev.evaluate_candidates(candidates, reads, filt)
        monkeypatch.undo()
        assert [(s.bad, s.good, s.unaligned) for s in got] == \
               [(s.bad, s.good, s.unaligned) for s in want]


def test_native_batch_long_paths_vs_oracle():
    """Long read paths (m >= 32) dispatch the native batch scorer's int16
    16-lane fill — differential vs the python oracle (fw + rc)."""
    import numpy as np

    from gfalign_tpu.io import native
    from gfalign_tpu.ops.nw_path import Step, nw_score_oracle, revcomp_path

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    C, R, n_stride, m_stride = 6, 10, 96, 96
    a = np.full((C, n_stride), -1, np.int32)
    al = np.zeros(C, np.int32)
    b = np.full((R, m_stride), -2, np.int32)
    bl = np.zeros(R, np.int32)
    a_paths, b_paths = [], []
    for c in range(C):
        n = int(rng.integers(5, 90))
        al[c] = n
        ids = rng.integers(0, 40, n)
        orc = rng.integers(0, 2, n)
        a[c, :n] = ids * 4 + orc
        a_paths.append([Step(int(i), "+-"[o]) for i, o in zip(ids, orc)])
    for r in range(R):
        m = int(rng.integers(32, 90))
        bl[r] = m
        ids = rng.integers(0, 40, m)
        orc = rng.integers(0, 2, m)
        b[r, :m] = ids * 4 + orc
        b_paths.append([Step(int(i), "+-"[o]) for i, o in zip(ids, orc)])
    got = native.nw_best_scores_batch(a, al, b, bl, 0, -1, -1, True)
    for c in range(C):
        for r in range(R):
            want = max(nw_score_oracle(a_paths[c], b_paths[r]),
                       nw_score_oracle(a_paths[c],
                                       revcomp_path(b_paths[r])))
            assert got[c][r] == want
