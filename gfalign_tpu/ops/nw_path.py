"""Needleman-Wunsch alignment over *paths of (node, orientation) steps*.

This is the hottest kernel of the framework: the tangle search re-scores
every read path against every candidate path expansion
(reference src/eval.cpp:92-93 inside the search loop at :134-189).

Exact-semantics contract (derived from reference src/alignments.cpp:499-554
and the dp-matrix reuse in src/eval.cpp:79; see SURVEY.md section 4 quirk 5):

  * A = candidate path (length n), B = read path (length m);
  * dp row 0 is initialized as j*gap for j <= n and stays 0 for j > n (the
    reference initializes the row over A's extent, not B's);
  * dp column 0 is all 0 (free leading candidate-gap);
  * vertical moves in the last column are free (free trailing candidate-gap):
    dp[i][j] = max(dp[i-1][j-1]+S, dp[i-1][j] + (gap if j<m else 0),
                   dp[i][j-1] + gap);
  * the reported score is NOT dp[n][m] but is recomputed during traceback:
    diagonal adds S; a vertical move subtracts 1 only if some B step was
    already emitted (so trailing candidate-overhang is free); a horizontal
    move subtracts 1; border moves (ii==0 or jj==0) are free;
  * traceback prefers diagonal, then vertical when
    dp[ii-1][jj] >= dp[ii][jj-1], else horizontal.

Two implementations, cross-tested in tests/test_nw.py:
  * a pure-Python oracle (reference behavior, used for byte-parity printing);
  * a batched JAX version: the per-row recurrence's horizontal dependency is
    an associative max-plus decay scan, so each row is one `cummax` over
    (candidate + j) — vectorized over reads AND candidates; the traceback is
    a fixed-trip-count `fori_loop` of O(n+m) vectorized gathers.  int32
    arithmetic keeps exact parity with the reference's int dp.

The device entry points (`nw_pair_scores`, `nw_best_scores`) are pure jnp
functions, usable directly inside shard_map for multi-chip scoring
(see parallel/score_step.py).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Sequence, Tuple

import numpy as np


class Step(NamedTuple):
    id: int
    orientation: str  # '+', '-', or '0' (undetermined start)


def revcomp_path(path: Sequence[Step]) -> List[Step]:
    """Reverse the step order and flip orientations.  Note the reference
    maps any non-'+' orientation (including '0') to '+'
    (include/alignments.h:64-70)."""
    return [Step(s.id, "-" if s.orientation == "+" else "+") for s in reversed(path)]


# ---------------------------------------------------------------------------
# Oracle (host, exact reference behavior, also returns the aligned pair)
# ---------------------------------------------------------------------------


class PathAlignment(NamedTuple):
    a: List[Step]   # candidate row with gap steps (id == -1)
    b: List[Step]   # read row with gap steps
    score: int


def _nw_matrix(a: Sequence[Step], b: Sequence[Step],
               match: int, mismatch: int, gap: int) -> np.ndarray:
    n, m = len(a), len(b)
    dp = np.zeros((n + 1, max(n, m) + 1), dtype=np.int64)
    for j in range(0, n + 1):          # row-0 extent quirk: over n, not m
        dp[0, j] = j * gap
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = match if a[i - 1] == b[j - 1] else mismatch
            dp[i, j] = max(dp[i - 1, j - 1] + s,
                           dp[i - 1, j] + (gap if j < m else 0),
                           dp[i, j - 1] + gap)
    return dp


def nw_align_oracle(a: Sequence[Step], b: Sequence[Step],
                    match: int = 0, mismatch: int = -1, gap: int = -1) -> PathAlignment:
    a = [Step(s[0], s[1]) for s in a]
    b = [Step(s[0], s[1]) for s in b]
    dp = _nw_matrix(a, b, match, mismatch, gap)
    n, m = len(a), len(b)
    sa: List[Step] = []
    sb: List[Step] = []
    score = 0
    sblen = 0
    ii, jj = n, m
    while ii != 0 or jj != 0:
        if ii == 0:
            sa.append(Step(-1, "0"))
            sb.append(b[jj - 1])
            jj -= 1
        elif jj == 0:
            sa.append(a[ii - 1])
            sb.append(Step(-1, "0"))
            ii -= 1
        else:
            s = match if a[ii - 1] == b[jj - 1] else mismatch
            if dp[ii, jj] == dp[ii - 1, jj - 1] + s:
                sa.append(a[ii - 1])
                sb.append(b[jj - 1])
                sblen += 1
                ii -= 1
                jj -= 1
                score += s
            elif dp[ii - 1, jj] >= dp[ii, jj - 1]:
                sa.append(a[ii - 1])
                sb.append(Step(-1, "0"))
                ii -= 1
                if sblen > 0:
                    score -= 1
            else:
                sa.append(Step(-1, "0"))
                sb.append(b[jj - 1])
                sblen += 1
                jj -= 1
                score -= 1
    sa.reverse()
    sb.reverse()
    return PathAlignment(sa, sb, score)


def nw_score_oracle(a: Sequence[Step], b: Sequence[Step]) -> int:
    return nw_align_oracle(a, b).score


# ---------------------------------------------------------------------------
# Batched device implementation
# ---------------------------------------------------------------------------
#
# Encoding: a step is one int32 key = id * 4 + orientation code
# (0='+', 1='-', 2='0'); pads are negative and never match.

ORIENT_CODE = {"+": 0, "-": 1, "0": 2}


def _encode(ids: np.ndarray, orients: np.ndarray, pad_key: int) -> np.ndarray:
    keys = ids.astype(np.int64) * 4 + orients.astype(np.int64)
    keys = np.where(ids < 0, pad_key, keys)
    return keys.astype(np.int32)


def encode_steps(steps: Sequence[Step], pad_to: int, pad_key: int = -1) -> Tuple[np.ndarray, int]:
    ids = np.full((pad_to,), -1, dtype=np.int32)
    orients = np.zeros((pad_to,), dtype=np.int8)
    for i, s in enumerate(steps):
        ids[i] = s.id
        orients[i] = ORIENT_CODE[s.orientation]
    return _encode(ids, orients, pad_key), len(steps)


def rc_keys_device(b_keys, b_len):
    """Reverse-complement encoded read paths on device: reverse each row's
    valid prefix and flip the orientation code ('-'<->'+', '0'->'+')."""
    import jax.numpy as jnp

    R, m = b_keys.shape
    jidx = jnp.arange(m, dtype=jnp.int32)[None, :]
    src = b_len[:, None] - 1 - jidx                    # reversed index
    src_clamped = jnp.clip(src, 0, m - 1)
    gathered = jnp.take_along_axis(b_keys, src_clamped, axis=1)
    ids = gathered // 4
    code = gathered % 4
    flipped = jnp.where(code == 0, 1, jnp.where(code == 1, 0, 0))
    out = ids * 4 + flipped
    return jnp.where((src >= 0) & (gathered >= 0), out, -2).astype(jnp.int32)


def _forward_exit_scores(a_keys, a_len, b_keys, b_len):
    """Forward DP that also propagates the traceback EXIT COLUMN — the
    whole score comes out of one scan, no walk.

    Telescoping proof (why only the exit column is needed): every
    traceback move is dp-consistent (the reference's move conditions each
    imply dp[cur] == dp[prev] + dp-move-cost), and the interior traceback
    costs equal the dp costs (at a vertical move in column jj,
    sblen == m - jj, so 'sblen > 0' and 'jj < m' coincide).  Telescoping
    along the walk: score = dp[n][m] - dp[0][j_exit], where j_exit is the
    column at which the walk first leaves the interior (0 when it exits
    via column 0) and dp[0][j] = -j for j <= n, 0 beyond (the row-0
    extent quirk).

    E(i, j) := exit column of the walk STARTING at (i, j):
      E(0, j) = j;  E(i, 0) = 0;  otherwise E(successor by the walk's
      move priority: diagonal, then up, then left).  Diagonal/up
      successors live on the previous row; LEFT successors chain within
      the current row to the nearest non-left cell (or column 0), which
      one cummax (last non-left position) + one gather resolves.  So E
      rides the same lax.scan as dp — this replaced a serial
      O(n+m)-trip while_loop of per-read gathers (_walk_scores, see git
      history) that cost several times the forward pass.

    a_keys: (n,), b_keys: (R, m); returns (scores (R,) int32)."""
    import jax
    import jax.numpy as jnp

    R, m = b_keys.shape
    jidx = jnp.arange(m + 1, dtype=jnp.int32)
    row0 = jnp.where(jidx <= a_len, -jidx, 0)
    row0 = jnp.broadcast_to(row0, (R, m + 1)).astype(jnp.int32)
    # tie the scan carry's sharding variance to the read batch so the body's
    # output type matches under shard_map's varying-axes tracking
    var0 = (0 * b_len[:, None].astype(jnp.int32)
            + 0 * jnp.asarray(a_len, jnp.int32))   # both axes' variance
    row0 = row0 + var0
    e0 = jnp.broadcast_to(jidx, (R, m + 1)).astype(jnp.int32) + var0
    gapv = jnp.where(jidx[None, 1:] < b_len[:, None], -1, 0).astype(jnp.int32)
    blen_idx = b_len.astype(jnp.int32)[:, None]
    zero_col = jnp.zeros((R, 1), jnp.int32) + var0[:, :1]

    def row_step(carry, a_key):
        prev, prev_e = carry
        s = jnp.where(b_keys == a_key, 0, -1).astype(jnp.int32)
        cand = jnp.maximum(prev[:, :-1] + s, prev[:, 1:] + gapv)
        c = jnp.concatenate([zero_col, cand], axis=1)
        z = jax.lax.cummax(c + jidx[None, :], axis=1)
        row = z - jidx[None, :]
        diag = row[:, 1:] == prev[:, :-1] + s
        up = prev[:, 1:] >= row[:, :-1]
        e_fresh = jnp.where(diag, prev_e[:, :-1], prev_e[:, 1:])
        e_cand = jnp.concatenate([zero_col, e_fresh], axis=1)
        nonleft = jnp.concatenate(
            [jnp.ones((R, 1), bool), diag | up], axis=1)
        last = jax.lax.cummax(jnp.where(nonleft, jidx[None, :], 0), axis=1)
        row_e = jnp.take_along_axis(e_cand, last, axis=1)
        dp_b = jnp.take_along_axis(row, blen_idx, axis=1)[:, 0]
        e_b = jnp.take_along_axis(row_e, blen_idx, axis=1)[:, 0]
        return (row, row_e), (dp_b, e_b)

    _, (dp_bs, e_bs) = jax.lax.scan(row_step, (row0, e0), a_keys)
    dp_b0 = jnp.take_along_axis(row0, blen_idx, axis=1)[:, 0]
    e_b0 = jnp.take_along_axis(e0, blen_idx, axis=1)[:, 0]
    dp_col = jnp.concatenate([dp_b0[None], dp_bs], axis=0)
    e_col = jnp.concatenate([e_b0[None], e_bs], axis=0)
    dp_nm = dp_col[a_len]
    j_exit = e_col[a_len]
    return dp_nm + jnp.where(j_exit <= a_len, j_exit, 0)


def nw_pair_scores(a_keys, a_len, b_keys, b_len):
    """Traceback scores for every (candidate, read) pair — pure jnp.

    a_keys: (C, n) int32, a_len: (C,), b_keys: (R, m), b_len: (R,)
    -> (C, R) int32."""
    import jax

    def one(ak, al):
        return _forward_exit_scores(ak, al, b_keys, b_len)

    return jax.vmap(one)(a_keys, a_len)


def nw_best_scores(a_keys, a_len, b_keys, b_len):
    """max(forward, reverse-complement) scores — pure jnp, shard_map-safe.

    fw and rc read batches are stacked into one 2R-row scoring pass: one
    kernel invocation instead of two (halves dispatch overhead, fills the
    device better)."""
    import jax.numpy as jnp

    both = jnp.concatenate([b_keys, rc_keys_device(b_keys, b_len)], axis=0)
    both_len = jnp.concatenate([b_len, b_len], axis=0)
    scores = nw_pair_scores(a_keys, a_len, both, both_len)
    R = b_keys.shape[0]
    return jnp.maximum(scores[:, :R], scores[:, R:])


@functools.lru_cache(maxsize=None)
def _jitted_best_scores(use_pallas: bool = False):
    import jax

    if use_pallas:
        from .nw_pallas import nw_best_scores_pallas

        return jax.jit(nw_best_scores_pallas)
    return jax.jit(nw_best_scores)


def _pallas_eligible() -> bool:
    """Use the Pallas forward on real TPU backends (~15-20% faster than the
    XLA row formulation); read batches are padded to TILE_R multiples."""
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pad_pow2(x: int, floor: int = 8) -> int:
    return max(floor, int(2 ** np.ceil(np.log2(max(x, 1)))))


def pad_bucket(x: int, floor: int = 8) -> int:
    """Geometric ~1.25x buckets rounded up to multiples of 8: the frontier
    (candidate) axis wastes at most ~25% padded compute vs pow2's ~2x,
    while keeping the number of compiled shapes logarithmic.  The search
    hot loop's scoring cost is proportional to the PADDED candidate count,
    so this is a direct steps/s lever (VERDICT r3 weak items 1/4)."""
    b = floor
    while b < x:
        b = -(-max(b + 8, int(b * 1.25)) // 8) * 8
    return b


def encode_path_batch(paths: Sequence[Sequence[Step]], pad_to: int,
                      pad_key: int = -2) -> Tuple[np.ndarray, np.ndarray]:
    keys = np.stack([encode_steps(p, pad_to, pad_key)[0] for p in paths]) \
        if paths else np.zeros((0, pad_to), np.int32)
    lens = np.array([len(p) for p in paths], dtype=np.int32)
    return keys, lens


def batched_best_scores(candidates: Sequence[Sequence[Step]],
                        read_paths: Sequence[Sequence[Step]],
                        read_chunk: int = 1024) -> np.ndarray:
    """Host wrapper: pad shapes to power-of-two buckets (bounded jit cache),
    chunk the read batch, and return (C, R) int32 best scores."""
    if not candidates or not read_paths:
        return np.zeros((len(candidates), len(read_paths)), dtype=np.int32)

    n_max = pad_pow2(max(len(c) for c in candidates))
    m_max = pad_pow2(max(len(r) for r in read_paths))
    C = len(candidates)
    C_pad = pad_pow2(C, floor=1)  # bucket the candidate dim too, or every
    # frontier size compiles its own executable (expensive over the tunnel)
    a_keys, a_len = encode_path_batch(
        [[Step(*s) for s in c] for c in candidates]
        + [[] for _ in range(C_pad - C)], n_max, pad_key=-1)
    b_keys, b_len = encode_path_batch(
        [[Step(*s) for s in r] for r in read_paths], m_max, pad_key=-2)

    R = b_keys.shape[0]
    chunk = max(8, read_chunk)
    use_pallas = _pallas_eligible()
    if use_pallas:
        chunk = max(128, (chunk // 128) * 128)
    scorer = _jitted_best_scores(use_pallas)
    outs = []
    for start in range(0, R, chunk):
        bk = b_keys[start:start + chunk]
        bl = b_len[start:start + chunk]
        want = chunk if (R > chunk or use_pallas) else bk.shape[0]
        if use_pallas and want % 128:
            want = -(-want // 128) * 128
        if bk.shape[0] < want:
            padn = want - bk.shape[0]
            bk = np.concatenate([bk, np.full((padn, m_max), -2, np.int32)])
            bl = np.concatenate([bl, np.zeros((padn,), np.int32)])
        outs.append(np.asarray(scorer(a_keys, a_len, bk, bl))[:, :bl.shape[0]])
    return np.concatenate(outs, axis=1)[:C, :R].astype(np.int32)
