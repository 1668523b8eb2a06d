"""Banded pairwise scorer: identical to the full pairwise DP whenever the
optimal alignment stays in-band, and edge/low-score detection for the
out-of-band fallback."""

import numpy as np

from gfalign_tpu.ops import seqalign
from gfalign_tpu.ops.seqalign import (PAD, _jitted_forward_pairs,
                                      banded_pair_scores)


def _full(reads, paths):
    return [np.asarray(x) for x in _jitted_forward_pairs()(reads, paths)]


def test_banded_matches_full_in_band():
    rng = np.random.default_rng(17)
    N, Lr, Lp, W = 24, 150, 400, 64
    reads = np.full((N, Lr), PAD, np.int8)
    paths = rng.integers(0, 4, size=(N, Lp)).astype(np.int8)
    deltas = np.zeros(N, np.int64)
    for n in range(N):
        rl = int(rng.integers(60, Lr + 1))
        start = int(rng.integers(0, Lp - rl))
        seq = paths[n, start:start + rl].copy()
        # a few substitutions and small indels (stay well inside the band)
        for pos in range(5, rl - 10, 25):
            seq[pos] = (seq[pos] + 1) % 4
        if n % 3 == 0:
            seq = np.concatenate([seq[:30], seq[33:]])  # 3-base deletion
        reads[n, :len(seq)] = seq
        deltas[n] = start
    b, bi, bj, edge = banded_pair_scores(reads, paths, deltas, width=W)
    fb, fbi, fbj = _full(reads, paths)
    assert not edge.any()
    np.testing.assert_array_equal(b, fb)
    np.testing.assert_array_equal(bi, fbi)
    np.testing.assert_array_equal(bj, fbj)


def test_banded_tie_break_matches_full():
    """Repeated motifs create score ties; the banded argmax must pick the
    same (min end row, then min end column) cell as the full kernel."""
    rng = np.random.default_rng(18)
    N, W = 8, 64
    motif = rng.integers(0, 4, size=20).astype(np.int8)
    path = np.tile(motif, 8)  # 160 bases of repeats
    reads = np.tile(motif, (N, 2)).astype(np.int8)  # 40-base reads
    paths = np.tile(path, (N, 1)).astype(np.int8)
    deltas = np.arange(N, dtype=np.int64) * 20  # each read banded on a copy
    b, bi, bj, edge = banded_pair_scores(reads, paths, deltas, width=W)
    fb, fbi, fbj = _full(reads, paths)
    np.testing.assert_array_equal(b, fb)
    np.testing.assert_array_equal(fbi, bi)
    # full DP picks the GLOBAL min-j tie; banded can only see its band, so
    # bj may sit a motif-period later for large deltas — but in-band bands
    # centered at delta=0 must agree exactly
    assert bj[0] == fbj[0]


def test_banded_out_of_band_is_detectable():
    """A wrong diagonal leaves the true alignment outside the band: the
    banded score is far below the full score (caller rescoring trigger)."""
    rng = np.random.default_rng(19)
    Lr, Lp, W = 100, 600, 64
    path = rng.integers(0, 4, size=(1, Lp)).astype(np.int8)
    read = path[:, 400:500].copy()
    wrong = np.array([0], np.int64)      # true delta is 400
    b, bi, bj, edge = banded_pair_scores(read, path, wrong, width=W)
    fb, _, _ = _full(read, path)
    assert fb[0] == 100
    assert b[0] < 40 or edge[0]


def test_banded_edge_flag_on_band_boundary():
    """An alignment drifting to the band edge sets the edge flag."""
    rng = np.random.default_rng(20)
    Lp, W = 400, 32
    path = rng.integers(0, 4, size=(1, Lp)).astype(np.int8)
    read = path[:, 100:200].copy()
    off_center = np.array([100 - (W // 2) + 1], np.int64)  # hug the band edge
    b, bi, bj, edge = banded_pair_scores(read, path, off_center, width=W)
    assert edge[0]


class TestBandedTraceback:
    """Parity of the banded native traceback (seq_banded_traceback) vs the
    full-matrix walk, and its gate behavior."""

    def _mutated_pair(self, rng, lr):
        read = rng.integers(0, 4, size=lr).astype(np.int8)
        path = read.copy()
        for _ in range(max(1, int(lr * 0.05))):
            p = int(rng.integers(0, len(path)))
            path[p] = rng.integers(0, 4)
        for _ in range(int(lr * 0.01) + 1):
            p = int(rng.integers(0, len(path)))
            if rng.random() < 0.5:
                path = np.delete(path, p)
            else:
                path = np.insert(path, p, np.int8(rng.integers(0, 4)))
        pre = rng.integers(0, 4, size=int(rng.integers(0, 40))).astype(np.int8)
        post = rng.integers(0, 4, size=int(rng.integers(0, 40))).astype(np.int8)
        return read, np.concatenate([pre, path, post]).astype(np.int8)

    def test_banded_matches_full_traceback(self):
        rng = np.random.default_rng(17)
        LR, LP = 512, 640
        checked = 0
        for _ in range(60):
            read, path = self._mutated_pair(rng, int(rng.integers(40, 400)))
            rpad = np.full(LR, seqalign.PAD, np.int8)
            rpad[:len(read)] = read
            ppad = np.full(LP, seqalign.PAD, np.int8)
            ppad[:len(path)] = path
            best, bi, bj = seqalign.batched_pair_scores(rpad[None], ppad[None])
            v, ei, ej = int(best[0]), int(bi[0]), int(bj[0])
            if v <= 0:
                continue
            full = seqalign.traceback(read, path, ei, ej)
            for width in (64, 128):
                res = seqalign.banded_traceback(read, path, ei, ej,
                                                ej - ei, width, v)
                pyres = seqalign._banded_traceback_py(read, path, ei, ej,
                                                      ej - ei, width, v)
                # native and numpy oracle agree on success/failure and value
                if res is None:
                    assert pyres is None
                    continue
                got = (res.score, res.qstart, res.pstart, res.matches, res.nm)
                assert pyres[:5] == got
                assert res == full   # gates passed => identical placement
                checked += 1
        assert checked >= 60

    def test_gate_wrong_expected_score_falls_back(self):
        rng = np.random.default_rng(3)
        read, path = self._mutated_pair(rng, 200)
        best, bi, bj = seqalign.batched_pair_scores(read[None], path[None])
        v, ei, ej = int(best[0]), int(bi[0]), int(bj[0])
        assert v > 0
        assert seqalign.banded_traceback(read, path, ei, ej, ej - ei,
                                         128, v + 1) is None

    def test_gate_band_edge_walk_falls_back(self):
        # a 20-base deletion (gap cost 60 < the 150-match gain, so the
        # optimum spans it) forces the walk across 20 diagonals — beyond a
        # 16-wide band centered on the end diagonal: a gate must fire
        # (never a wrong walk)
        rng = np.random.default_rng(4)
        a = rng.integers(0, 4, size=150).astype(np.int8)
        b = rng.integers(0, 4, size=150).astype(np.int8)
        junk = rng.integers(0, 4, size=20).astype(np.int8)
        read = np.concatenate([a, b]).astype(np.int8)
        path = np.concatenate([a, junk, b]).astype(np.int8)
        best, bi, bj = seqalign.batched_pair_scores(read[None], path[None])
        v, ei, ej = int(best[0]), int(bi[0]), int(bj[0])
        assert v > 0
        full = seqalign.traceback(read, path, ei, ej)
        assert sum(n for n, op in full.cigar if op == "D") == 20
        res = seqalign.banded_traceback(read, path, ei, ej, ej - ei, 16, v)
        assert res is None

    def test_end_cell_off_band_falls_back(self):
        read = np.zeros(50, np.int8)
        path = np.zeros(60, np.int8)
        # u_end = ej - ei - delta + w2 lands outside [1, width-2]
        assert seqalign.banded_traceback(read, path, 50, 60, 500, 64, 50) is None


def test_banded_pool_pallas_parity():
    """The Pallas banded pool kernel (interpret mode on CPU) is bit-exact
    vs the XLA banded scan over the same gathered pairs, including
    tie-breaks, PAD tails, off-band deltas, and repeated motifs."""
    import jax

    from gfalign_tpu.ops.seqalign import _banded_forward
    from gfalign_tpu.ops.seqalign_pallas import banded_pool_scores_pallas

    rng = np.random.default_rng(31)
    lr, lp, W, N = 64, 192, 16, 128
    read_pool = np.full((16, lr), PAD, np.int8)
    path_pool = rng.integers(0, 4, size=(8, lp)).astype(np.int8)
    path_pool[5, 100:] = PAD                       # short path row
    motif = rng.integers(0, 4, size=10).astype(np.int8)
    path_pool[6] = np.tile(motif, -(-lp // 10))[:lp]   # tie-rich repeats
    for r in range(16):
        rl = int(rng.integers(8, lr + 1))
        p = int(rng.integers(0, 8))
        start = int(rng.integers(0, lp - lr))
        seq = path_pool[p, start:start + rl].copy()
        for pos in range(2, rl - 2, 9):
            seq[pos] = (seq[pos] + 1) % 4
        read_pool[r, :rl] = seq
    read_idx = rng.integers(0, 16, size=N).astype(np.int32)
    path_idx = rng.integers(0, 8, size=N).astype(np.int32)
    deltas = rng.integers(-40, 200, size=N).astype(np.int32)  # incl off-band

    rc = read_pool[read_idx]
    pc = path_pool[path_idx]
    xb, xi, xj, xe = [np.asarray(v) for v in jax.jit(
        lambda r, p, d: _banded_forward(r, p, d, width=W))(rc, pc, deltas)]
    pb, pi, pj, pe = [np.asarray(v) for v in banded_pool_scores_pallas(
        read_pool, path_pool, read_idx, path_idx, deltas, W, interpret=True)]
    np.testing.assert_array_equal(pb, xb)
    np.testing.assert_array_equal(pi, xi)
    np.testing.assert_array_equal(pj, xj)
    np.testing.assert_array_equal(pe, xe)
