"""Banded pairwise scorer: identical to the full pairwise DP whenever the
optimal alignment stays in-band, and edge/low-score detection for the
out-of-band fallback."""

import numpy as np

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
