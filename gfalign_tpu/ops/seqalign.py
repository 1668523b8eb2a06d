"""Base-level local alignment (Smith-Waterman, linear gap) for the align
mode — the capability the reference outsources to GraphAligner
(reference src/main.cpp:167-169).

Device/host split designed for TPU throughput:
  * the O(Lr x Lp) forward scoring runs on device, batched over
    (reads x candidate path sequences); the per-row horizontal dependency is
    the same associative max-plus decay scan as the path-NW kernel, so each
    row is elementwise work + one cummax;
  * only the selected placements (a handful per read) are tracebacked, on
    host, by recomputing the single pair's small DP — the classic
    score-on-accelerator / traceback-on-host split.

Scoring: match +1, mismatch -2, gap -3 (linear).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import numpy as np

MATCH = 1
MISMATCH = -2
GAP = -3


class Placement(NamedTuple):
    score: int
    qstart: int
    qend: int
    pstart: int
    pend: int
    cigar: List[Tuple[int, str]]   # [(run_length, op)] ops: = X I D
    matches: int
    nm: int


PAD = 5       # padding sentinel; code 4 = N (aligns as mismatch)
_STRIP_UNROLL_S = 64   # assemble_strip: unroll compare-selects up to this
                       # many path steps; rolled fori_loop above (ADVICE r3)
_BLOCK = -1000  # padding must never extend an alignment


def _subs(r_char, p_codes):
    import jax.numpy as jnp

    is_pad = (r_char == PAD)[..., None] | (p_codes == PAD)
    match = ((r_char < 4)[..., None]) & (p_codes < 4) & (r_char[..., None] == p_codes)
    return jnp.where(is_pad, _BLOCK,
                     jnp.where(match, MATCH, MISMATCH)).astype(jnp.int32)


def local_forward(read_codes, path_codes):
    """Best local alignment cell for every (read, path) pair.

    read_codes: (R, Lr) int8 (0-3 bases, >=4 pad)
    path_codes: (P, Lp) int8
    returns (best, best_i, best_j): each (R, P) int32; best_i/best_j are the
    END cell (1-based DP indices) of the maximum-scoring local alignment.
    """
    import jax
    import jax.numpy as jnp

    R, Lr = read_codes.shape
    P, Lp = path_codes.shape
    jidx = jnp.arange(Lp + 1, dtype=jnp.int32)
    gj = GAP * jidx  # decay offsets for the cummax trick

    def row_step(carry, r_chars):
        H, best, bi, bj, i = carry
        s = _subs(r_chars[:, None], path_codes[None, :, :])        # (R,P,Lp)
        c = jnp.maximum(0, jnp.maximum(H[:, :, :-1] + s, H[:, :, 1:] + GAP))
        c0 = jnp.concatenate([jnp.zeros((R, P, 1), jnp.int32), c], axis=2)
        z = jax.lax.cummax(c0 - gj[None, None, :], axis=2)
        Hn = z + gj[None, None, :]
        row_best = Hn.max(axis=2)
        row_arg = Hn.argmax(axis=2).astype(jnp.int32)
        improved = row_best > best
        best = jnp.where(improved, row_best, best)
        bi = jnp.where(improved, i + 1, bi)
        bj = jnp.where(improved, row_arg, bj)
        return (Hn, best, bi, bj, i + 1), None

    H0 = jnp.zeros((R, P, Lp + 1), jnp.int32)
    best0 = jnp.zeros((R, P), jnp.int32)
    zero = jnp.zeros((R, P), jnp.int32)
    (H, best, bi, bj, _), _ = jax.lax.scan(
        row_step, (H0, best0, zero, zero, jnp.int32(0)),
        jnp.transpose(read_codes.astype(jnp.int32)))
    return best, bi, bj


def local_forward_pairs(read_codes, path_codes):
    """Pairwise variant: row i of reads aligns against row i of paths only.

    read_codes: (N, Lr), path_codes: (N, Lp) -> (best, bi, bj) each (N,).
    Used by the seeded aligner, where each read has its own small candidate
    path set — O(N) work instead of the O(R x P) cross product."""
    import jax
    import jax.numpy as jnp

    N, Lr = read_codes.shape
    _, Lp = path_codes.shape
    jidx = jnp.arange(Lp + 1, dtype=jnp.int32)
    gj = GAP * jidx

    def row_step(carry, r_chars):
        H, best, bi, bj, i = carry
        r = r_chars[:, None]                                    # (N, 1)
        is_pad = (r == PAD) | (path_codes == PAD)
        match = (~is_pad) & (r < 4) & (path_codes < 4) & (r == path_codes)
        s = jnp.where(is_pad, _BLOCK,
                      jnp.where(match, MATCH, MISMATCH)).astype(jnp.int32)
        c = jnp.maximum(0, jnp.maximum(H[:, :-1] + s, H[:, 1:] + GAP))
        c0 = jnp.concatenate([jnp.zeros((N, 1), jnp.int32), c], axis=1)
        z = jax.lax.cummax(c0 - gj[None, :], axis=1)
        Hn = z + gj[None, :]
        row_best = Hn.max(axis=1)
        row_arg = Hn.argmax(axis=1).astype(jnp.int32)
        improved = row_best > best
        best = jnp.where(improved, row_best, best)
        bi = jnp.where(improved, i + 1, bi)
        bj = jnp.where(improved, row_arg, bj)
        return (Hn, best, bi, bj, i + 1), None

    H0 = jnp.zeros((N, Lp + 1), jnp.int32)
    zero = jnp.zeros((N,), jnp.int32)
    (H, best, bi, bj, _), _ = jax.lax.scan(
        row_step, (H0, zero, zero, zero, jnp.int32(0)),
        jnp.transpose(read_codes.astype(jnp.int32)))
    return best, bi, bj


@functools.lru_cache(maxsize=None)
def _jitted_forward_pairs():
    import jax
    return jax.jit(local_forward_pairs)


def _use_pallas(read_codes: np.ndarray, path_codes: np.ndarray) -> bool:
    """The anti-diagonal Pallas forward (ops/seqalign_pallas.py) is the
    production path on real TPU: bit-exact vs this row formulation and
    5-7x faster at align-mode shapes (17-30 Gcell/s vs 3-4 for the XLA
    scan at Lp >= 2k, where the scan's HBM carry traffic dominates)."""
    if read_codes.size == 0 or path_codes.size == 0:
        return False
    from .nw_path import _pallas_eligible
    from .seqalign_pallas import shapes_fit

    return (_pallas_eligible()
            and shapes_fit(read_codes.shape[1], path_codes.shape[1]))


def batched_pair_scores(read_codes: np.ndarray, path_codes: np.ndarray):
    if _use_pallas(read_codes, path_codes):
        from .seqalign_pallas import local_forward_pairs_pallas

        return local_forward_pairs_pallas(read_codes, path_codes)
    fn = _jitted_forward_pairs()
    best, bi, bj = fn(read_codes, path_codes)
    return np.asarray(best), np.asarray(bi), np.asarray(bj)


@functools.lru_cache(maxsize=None)
def _jitted_forward():
    import jax
    return jax.jit(local_forward)


def batched_local_scores(read_codes: np.ndarray, path_codes: np.ndarray):
    if _use_pallas(read_codes, path_codes):
        from .seqalign_pallas import local_forward_pallas

        return local_forward_pallas(read_codes, path_codes)
    fn = _jitted_forward()
    best, bi, bj = fn(read_codes, path_codes)
    return np.asarray(best), np.asarray(bi), np.asarray(bj)


# ---------------------------------------------------------------------------
# Banded pairwise scoring (seeded align fast path)
# ---------------------------------------------------------------------------


def banded_pair_scores(read_codes: np.ndarray, path_codes: np.ndarray,
                       deltas: np.ndarray, width: int = 128):
    """Pairwise local alignment restricted to a band around a known
    diagonal — the GraphAligner-style banded DP the seeded aligner uses
    when anchors supply the expected diagonal (read pos i aligns near path
    pos i + delta).  ~Lp/width fewer cells than local_forward_pairs;
    results are identical whenever the optimal alignment stays in-band
    (tests/test_align_banded.py).  Out-of-band DETECTION is best-effort:
    the edge flag fires when the best END cell sits on a band-edge lane
    (callers rescore flagged and sub-threshold pairs with the full DP).
    Residual risk, documented: an optimal path that leaves the band
    mid-walk while ENDING at an interior cell is scored lower silently —
    no cheap per-row detector exists because edge-lane values are
    dominated by the main alignment's gap-chain leak (best - |GAP| x lane
    distance; both argmax-at-edge and value-threshold detectors were
    measured to fire on most strong in-band pairs).  Anchored deltas make
    the case rare, and the traceback parity gates (banded_traceback) keep
    every EMITTED placement self-consistent with its score.

    Band coordinates: H_band[i][u] = H[i][j], j = i + delta - width//2 + u.
    The diagonal predecessor keeps its lane, 'up' shifts by +1, and the
    horizontal chain is the usual max-plus prefix over the band — so the
    window slides one path position per row, which a pre-extracted strip
    (strip[n, t] = path[n, t + delta - width//2], PAD outside) turns into
    a pair-uniform dynamic slice: no gathers anywhere.

    read_codes: (N, Lr) int8, path_codes: (N, Lp) int8, deltas: (N,) int.
    Returns (best, bi, bj, edge) — as local_forward_pairs plus a bool
    band-edge-touch flag per pair."""
    fn = _jitted_banded(width)
    best, bi, bj, edge = fn(read_codes, path_codes,
                            np.asarray(deltas, np.int32))
    return (np.asarray(best), np.asarray(bi), np.asarray(bj),
            np.asarray(edge))


@functools.lru_cache(maxsize=None)
def _jitted_banded(width: int):
    import jax

    return jax.jit(functools.partial(_banded_forward, width=width))


def assemble_strip(arena, cum_off, base_ptr, plens, deltas, n_cols: int,
                   shift: int, w2: int):
    """Assemble banded strips ON DEVICE from the oriented-segment arena.

    A candidate path is a concatenation of oriented segment slices; path
    position x of pair n lives at arena[base_ptr[n, k] + x] where k is the
    last step with cum_off[n, k] <= x.  strip[n, t] = path char at
    x = t + delta_n - w2 - shift, PAD outside [0, plen).

    arena: (A,) int8 oriented segment codes (fw + rc of every segment,
        uploaded once — paths never ship their bytes to the device).
    cum_off: (N, S) int32, step start offsets, padded with INT32_MAX.
    base_ptr: (N, S) int32 (arena start - cum_off + overlap drop).
    plens, deltas: (N,) int32.  S must be a power of two; cum_off[:, 0]
    must be 0 (every path has a first step starting at 0)."""
    import jax.numpy as jnp

    N, S = cum_off.shape
    t = jnp.arange(n_cols, dtype=jnp.int32)
    src = t[None, :] + deltas[:, None] - w2 - shift          # (N, n_cols)
    valid = (src >= 0) & (src < plens[:, None])
    srcc = jnp.clip(src, 0, None)
    # step selection: last k with cum_off[n, k] <= src, by S broadcast
    # compare-selects (pure VPU work).  The original log2(S) binary search
    # via take_along_axis cost 2.3 s per 4096-pair chunk on TPU — gathers
    # are serialized there; these selects + the single arena take below
    # run the same chunk in 0.30 s (bench/micro_strip.py, measured at
    # S=32).  cum_off pad rows are INT32_MAX so they never win the select.
    # NOTE the S dependence: work is O(S) per strip element either way,
    # but the unrolled form also makes the TRACE O(S); above
    # _STRIP_UNROLL_S we switch to a lax.fori_loop of the same selects so
    # compile time and program size stay bounded for many-step paths
    # (still gather-free — the binary search is the slow path here).
    if S <= _STRIP_UNROLL_S:
        bsel = jnp.broadcast_to(base_ptr[:, 0:1], src.shape)
        for s in range(1, S):
            bsel = jnp.where(cum_off[:, s:s + 1] <= srcc,
                             base_ptr[:, s:s + 1], bsel)
    else:
        import jax

        def step(s, acc):
            return jnp.where(cum_off[:, s][:, None] <= srcc,
                             base_ptr[:, s][:, None], acc)

        bsel = jax.lax.fori_loop(
            1, S, step, jnp.broadcast_to(base_ptr[:, 0:1], src.shape))
    ai = bsel + srcc
    codes = jnp.take(arena, jnp.clip(ai, 0, arena.shape[0] - 1), mode="clip")
    return jnp.where(valid, codes, PAD).astype(jnp.int8)


def banded_arena_scores(arena, cum_off_pool, base_ptr_pool, plen_pool,
                        read_pool, read_idx, path_idx, deltas,
                        width: int = 128, materialize: bool = True):
    """Banded pairwise scoring with device-side strip assembly: per
    dispatch only int32 row indices + deltas leave the host; the path
    BYTES never do (they are re-materialized from the segment arena).
    Returns (best, bi, bj, edge) like banded_pair_scores.

    materialize=False returns device arrays WITHOUT waiting: callers with
    several chunks dispatch them all, then fetch — overlapping device
    execution with host chunk prep and hiding the per-dispatch tunnel
    roundtrip (the fetch is the synchronization point)."""
    from .nw_path import _pallas_eligible

    read_idx = np.asarray(read_idx, np.int32)
    path_idx = np.asarray(path_idx, np.int32)
    deltas = np.asarray(deltas, np.int32)
    out = None
    if _pallas_eligible() and read_idx.shape[0] % 128 == 0:
        from .seqalign_pallas import (banded_arena_scores_pallas,
                                      banded_shapes_fit)

        lr = read_pool.shape[1]
        if lr % 8 == 0 and width % 8 == 0 and banded_shapes_fit(lr, width):
            out = banded_arena_scores_pallas(
                arena, cum_off_pool, base_ptr_pool, plen_pool, read_pool,
                read_idx, path_idx, deltas, width)
    if out is None:
        fn = _jitted_banded_arena(width)
        out = fn(arena, cum_off_pool, base_ptr_pool, plen_pool, read_pool,
                 read_idx, path_idx, deltas)
    if not materialize:
        return out
    return tuple(np.asarray(x) for x in out)


@functools.lru_cache(maxsize=None)
def _jitted_banded_arena(width: int):
    import jax
    import jax.numpy as jnp

    def fn(arena, cum_off, base_ptr, plens, read_pool, read_idx, path_idx,
           deltas):
        rc = jnp.take(read_pool, read_idx, axis=0, mode="clip")
        co = jnp.take(cum_off, path_idx, axis=0, mode="clip")
        bp = jnp.take(base_ptr, path_idx, axis=0, mode="clip")
        pl = jnp.take(plens, path_idx, mode="clip")
        lr = rc.shape[1]
        strip = assemble_strip(arena, co, bp, pl, deltas, lr + width,
                               shift=0, w2=width // 2)
        return _banded_forward_core(rc, strip, deltas, pl, width=width)

    return jax.jit(fn)




def _banded_forward(read_codes, path_codes, deltas, *, width: int):
    import jax.numpy as jnp

    Lr = read_codes.shape[1]
    lp = path_codes.shape[1]
    W2 = width // 2
    # strip extraction ON DEVICE (the host numpy version cost ~2 s per
    # 2048-pair round on this box): strip[n, t] = path[n, t + delta - W2]
    t = jnp.arange(Lr + width, dtype=jnp.int32)
    src = t[None, :] + deltas[:, None] - W2
    ok = (src >= 0) & (src < lp)
    strip = jnp.where(ok, jnp.take_along_axis(
        path_codes, jnp.clip(src, 0, lp - 1), axis=1), PAD)
    plens = jnp.full(read_codes.shape[:1], lp, jnp.int32)
    return _banded_forward_core(read_codes, strip, deltas, plens, width=width)


def _banded_forward_core(read_codes, strip, deltas, plens, *, width: int):
    """Banded scan over a pre-extracted strip (strip[n, t] = path char at
    position t + delta - W2, PAD outside); `plens` bounds the in-path
    region per pair.  Cells beyond a path's true length can never win the
    best (every move into them strictly decays), so calling this with
    plens = padded pool width or with true path lengths yields identical
    (best, bi, bj, edge)."""
    import jax
    import jax.numpy as jnp

    N, Lr = read_codes.shape
    W2 = width // 2
    uidx = jnp.arange(width, dtype=jnp.int32)
    gj = GAP * jnp.arange(width + 1, dtype=jnp.int32)
    lp_col = plens.astype(jnp.int32)[:, None]

    # NOTE on mid-walk out-of-band detection: none is attempted in this
    # scan.  Band-edge lane values are dominated by the gap-chain "leak" of
    # the main in-band alignment (best - |GAP| x lane distance), so any
    # cheap per-row edge-value/argmax flag either fires on most strong
    # in-band pairs or detects nothing — measured, not supposed.  The edge
    # flag below covers only the END cell; residual divergence is
    # documented in banded_pair_scores and bounded by the caller's
    # sub-threshold rescoring + the traceback parity gates.
    def row_step(carry, r_chars):
        H, best, bi, bj, bu, i1 = carry          # i1 = current row (1-based)
        # window for row i1 = strip[:, i1-1 : i1-1+width] (pair-uniform slice)
        win = jax.lax.dynamic_slice_in_dim(strip, i1 - 1, width, 1)
        win = win.astype(jnp.int32)
        # j(u) for this row: i1 + delta - W2 + u
        j_of_u = i1 + deltas[:, None] - W2 + uidx[None, :]
        in_path = (j_of_u >= 1) & (j_of_u <= lp_col)
        r = r_chars[:, None]
        is_pad = (r == PAD) | (win == PAD)
        match = (~is_pad) & (r < 4) & (win < 4) & (r == win)
        s = jnp.where(is_pad, _BLOCK,
                      jnp.where(match, MATCH, MISMATCH)).astype(jnp.int32)
        up = jnp.concatenate([H[:, 1:], jnp.full((N, 1), _BLOCK, jnp.int32)],
                             axis=1)
        c = jnp.maximum(0, jnp.maximum(H + s, up + GAP))
        c = jnp.where(in_path, c, 0)
        # horizontal chain along the band (max-plus prefix)
        c0 = jnp.concatenate([jnp.zeros((N, 1), jnp.int32), c], axis=1)
        z = jax.lax.cummax(c0 - gj[None, :], axis=1)
        Hn = (z + gj[None, :])[:, 1:]
        Hn = jnp.where(in_path, Hn, 0)
        row_best = Hn.max(axis=1)
        row_u = Hn.argmax(axis=1).astype(jnp.int32)
        improved = row_best > best
        best = jnp.where(improved, row_best, best)
        bi = jnp.where(improved, i1, bi)
        bj = jnp.where(improved,
                       jnp.take_along_axis(j_of_u, row_u[:, None],
                                           axis=1)[:, 0], bj)
        bu = jnp.where(improved, row_u, bu)
        return (Hn, best, bi, bj, bu, i1 + 1), None

    H0 = jnp.zeros((N, width), jnp.int32)
    zero = jnp.zeros((N,), jnp.int32)
    reads_t = jnp.transpose(read_codes.astype(jnp.int32))
    (H, best, bi, bj, bu, _), _ = jax.lax.scan(
        row_step, (H0, zero, zero, zero, zero, jnp.int32(1)), reads_t)
    ok = best > 0
    edge = ok & ((bu <= 0) | (bu >= width - 1))
    return (jnp.where(ok, best, 0), jnp.where(ok, bi, 0),
            jnp.where(ok, bj, 0), edge)


# ---------------------------------------------------------------------------
# Host traceback for a selected (read, path) pair
# ---------------------------------------------------------------------------


def _matrix(read: np.ndarray, path: np.ndarray) -> np.ndarray:
    Lr, Lp = len(read), len(path)
    H = np.zeros((Lr + 1, Lp + 1), dtype=np.int32)
    decay = -GAP * np.arange(Lp, dtype=np.int32)  # max-plus decay offsets
    for i in range(1, Lr + 1):
        rc = read[i - 1]
        sub = np.where((path == PAD) | (rc == PAD), _BLOCK,
                       np.where((path < 4) & (rc < 4) & (path == rc), MATCH, MISMATCH))
        prev = H[i - 1]
        c = np.maximum(0, np.maximum(prev[:-1] + sub, prev[1:] + GAP))
        # horizontal chain H[j] = max(c[j], H[j-1]+GAP) as one accumulate
        H[i, 1:] = np.maximum.accumulate(c + decay) - decay
    return H


def _runs(ops) -> List[Tuple[int, str]]:
    """Run-length encode an op sequence (str from the native traceback,
    list of chars from the python oracle).  Vectorized: the char loop was
    ~0.7 ms per placement at 8 kb read scale."""
    if not ops:
        return []
    s = ops if isinstance(ops, str) else "".join(ops)
    a = np.frombuffer(s.encode(), np.uint8)
    starts = np.flatnonzero(np.concatenate([[True], a[1:] != a[:-1]]))
    counts = np.diff(np.concatenate([starts, [len(a)]]))
    return [(int(c), chr(a[i])) for c, i in zip(counts, starts)]


def traceback(read: np.ndarray, path: np.ndarray,
              end_i: int, end_j: int) -> Placement:
    """Recompute the pair DP and walk back from (end_i, end_j) to H==0.

    Dispatches to the native C++ port (seq_local_traceback) when the host
    library is available — the full-matrix numpy row loop below is the
    oracle and fallback (equality fuzzed in tests/test_native.py)."""
    from ..io import native

    res = native.local_traceback(read, path, end_i, end_j,
                                 MATCH, MISMATCH, GAP, PAD, _BLOCK)
    if res is not None:
        score, qstart, pstart, matches, nm, ops = res
        return Placement(score, qstart, end_i, pstart, end_j,
                         _runs(ops), matches, nm)
    return _traceback_py(read, path, end_i, end_j)


def banded_traceback(read: np.ndarray, path: np.ndarray,
                     end_i: int, end_j: int, delta: int, width: int,
                     expected: int):
    """Banded traceback for a pair scored by banded_pair_scores: recomputes
    only the band (O(end_i x width) vs the full matrix's O(end_i x end_j))
    and walks back from (end_i, end_j).

    Banded H <= full H even at interior cells, so the walk is only trusted
    behind two parity gates: the banded end-cell value must equal
    `expected` (the device score) and the walk must never touch a band-edge
    lane.  Returns None when a gate fails (or coordinates are off-band) —
    the caller falls back to the exact full-matrix traceback().  The
    exhaustive align mode (byte-locked fixtures) never uses this path."""
    from ..io import native

    res = native.banded_local_traceback(read, path, end_i, end_j, delta,
                                        width, expected, MATCH, MISMATCH,
                                        GAP, PAD, _BLOCK)
    if res is None and not native.available():
        res = _banded_traceback_py(read, path, end_i, end_j, delta, width,
                                   expected)
    if res is None:
        return None
    score, qstart, pstart, matches, nm, ops = res
    return Placement(score, qstart, end_i, pstart, end_j,
                     _runs(ops), matches, nm)


def _banded_traceback_py(read: np.ndarray, path: np.ndarray,
                         end_i: int, end_j: int, delta: int, width: int,
                         expected: int):
    """numpy mirror of native seq_banded_traceback (oracle + fallback);
    same parity gates, same return contract (None = gate failed)."""
    lr, lp = len(read), len(path)
    if end_i < 0 or end_j < 0 or end_i > lr or end_j > lp or width < 4:
        return None
    w2 = width // 2
    u_end = end_j - end_i - delta + w2
    if u_end <= 0 or u_end >= width - 1:
        return None
    H = np.zeros((end_i + 1, width), np.int32)
    uidx = np.arange(width)
    decay = -GAP * uidx.astype(np.int32)
    for i in range(1, end_i + 1):
        j_of_u = i + delta - w2 + uidx
        in_path = (j_of_u >= 1) & (j_of_u <= lp)
        pc = path[np.clip(j_of_u - 1, 0, lp - 1)]
        rc = read[i - 1]
        sub = np.where((pc == PAD) | (rc == PAD), _BLOCK,
                       np.where((pc < 4) & (rc < 4) & (pc == rc),
                                MATCH, MISMATCH))
        prev = H[i - 1]
        up = np.concatenate([prev[1:], [_BLOCK]])
        c = np.maximum(0, np.maximum(prev + sub, up + GAP))
        c = np.where(in_path, c, 0)
        row = np.maximum.accumulate(c + decay) - decay
        H[i] = np.where(in_path, row, 0)
    i, u = end_i, u_end
    if int(H[i, u]) != expected:
        return None
    score = int(H[i, u])
    ops: List[str] = []
    matches = 0
    nm = 0
    while i > 0 and H[i, u] > 0:
        if u <= 0 or u >= width - 1:
            return None
        j = i + delta - w2 + u
        if j <= 0:
            break
        sub = MATCH if (read[i - 1] == path[j - 1] and read[i - 1] < 4) else MISMATCH
        if H[i, u] == H[i - 1, u] + sub:
            ops.append("=" if sub == MATCH else "X")
            if sub == MATCH:
                matches += 1
            else:
                nm += 1
            i -= 1
        elif H[i, u] == H[i - 1, u + 1] + GAP:
            ops.append("I")
            nm += 1
            i -= 1
            u += 1
        elif H[i, u] == H[i, u - 1] + GAP:
            ops.append("D")
            nm += 1
            u -= 1
        else:
            break
    if u <= 0 or u >= width - 1:
        return None
    ops.reverse()
    j = i + delta - w2 + u
    return score, i, max(0, j), matches, nm, "".join(ops)


def _traceback_py(read: np.ndarray, path: np.ndarray,
                  end_i: int, end_j: int) -> Placement:
    H = _matrix(read, path)
    i, j = end_i, end_j
    score = int(H[i, j])
    ops: List[str] = []
    matches = 0
    nm = 0
    while i > 0 and j > 0 and H[i, j] > 0:
        sub = MATCH if (read[i - 1] == path[j - 1] and read[i - 1] < 4) else MISMATCH
        if H[i, j] == H[i - 1, j - 1] + sub:
            if sub == MATCH:
                ops.append("=")
                matches += 1
            else:
                ops.append("X")
                nm += 1
            i -= 1
            j -= 1
        elif H[i, j] == H[i - 1, j] + GAP:
            ops.append("I")
            nm += 1
            i -= 1
        elif H[i, j] == H[i, j - 1] + GAP:
            ops.append("D")
            nm += 1
            j -= 1
        else:  # local start (c floored at 0 mid-row)
            break
    ops.reverse()
    return Placement(score, i, end_i, j, end_j, _runs(ops), matches, nm)
