"""Pallas TPU kernel for the NW path-alignment forward pass.

The XLA row formulation (ops/nw_path._forward_move_codes) pays a log(m)
factor for the per-row horizontal max-plus scan (cummax).  This kernel uses
the classic systolic ANTI-DIAGONAL formulation instead: cell (i, j) lives on
diagonal d = i + j at offset k = j, and

    D_d[k] = max(D_{d-2}[k-1] + S(d-k, k),          # diagonal
                 D_{d-1}[k]   + vgap(k),            # vertical
                 D_{d-1}[k-1] - 1)                  # horizontal

Because the horizontal predecessor (i, j-1) is on the *previous* diagonal,
there is no intra-step dependency at all — each step is pure elementwise
VPU work plus two sublane shifts.  dp values are bit-identical to the row
formulation (same recurrence, same border quirks):
  * column 0 (k == 0) is 0;
  * row 0 (k == d) is -d for d <= n, 0 beyond (the reference's row-0 extent
    quirk, see ops/nw_path.py);
  * vertical moves are free in a read's last column (k == b_len).

Layout per kernel instance (grid = (C, R/TILE_R)):
  * diagonal offset k on sublanes (m+1 rows), reads on lanes (TILE_R=128);
  * the A-window W_d[k] = A[d-1-k] is CARRIED and rolled one sublane per
    step; incoming heads A[d-1] are fetched 8 at a time from an 8-aligned
    slice (Mosaic makes unaligned multi-row dynamic slices expensive and
    crashes on unaligned single-row ones), with static in-block row picks;
  * the traceback is ELIMINATED: the walk's only output is the exit column
    j_exit, and "exit column of the walk starting at (i, j)" satisfies
    E(0, j) = j, E(i, 0) = 0, E(i, j) = E(move-code successor) — all
    successors live on earlier diagonals, so E propagates forward inside
    the same loop (two extra carries).  This replaces the old int8
    move-code matrices (65x the HBM bytes) and the serial per-record XLA
    gather walk, which cost 6x the forward pass;
  * outputs: per-diagonal dp values and E values at each read's final
    column (dp[n][m] and j_exit live on diagonal a_len + b_len).

Scores are bit-exact with the row formulation and the host oracle
(tests/test_nw.py, tests/test_search_differential.py).
"""

from __future__ import annotations

import functools

import numpy as np

TILE_R = 128
SENTINEL = -(1 << 20)  # A-window padding: never equals a key, dominates max


def _pad_l(m: int) -> int:
    return ((m + 8 + 7) // 8) * 8


def _n_diag_pad(n: int, m: int) -> int:
    return (-(-(n + m) // 8)) * 8


def _kernel_factory(n: int, m: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    assert n % 8 == 0, "candidate dim must be padded to a multiple of 8"
    n_diag = n + m
    pad_l = _pad_l(m)
    n_blocks = -(-n_diag // 8)

    def kernel(alen_ref, rap_ref, bs_ref, blen_ref, out_ref):
        # alen_ref: (1, 1, 1) int32 (SMEM) candidate length
        # rap_ref:  (1, pad_l + n, TILE_R): [SENTINEL]*pad_l + reverse(A)
        #           (lane-broadcast; A pads are -1, also never matching)
        # bs_ref:   (1, m + 1, TILE_R) shifted read keys (row k = B[k-1])
        # blen_ref: (1, 1, TILE_R) read lengths
        # out_ref:  (1, 1, 1, TILE_R) int32 FINAL traceback scores
        #
        # E(i, j) is the column at which the traceback STARTED AT (i, j)
        # leaves the interior: E(0, j) = j, E(i, 0) = 0, otherwise E of the
        # move-code successor.  Successors live on earlier diagonals, so E
        # propagates forward exactly like dp — which removes BOTH the move-
        # code output (65x the HBM traffic) and the serial XLA gather walk
        # that used to dominate the scoring cost 6:1.  The score's two
        # ingredients, dp[n][m] and j_exit = E(n, m), both live at column
        # k = b_len on diagonal d = a_len + b_len — each lane sees its hit
        # diagonal exactly once, so two running where-selects capture them
        # and the kernel emits the finished score (no per-diagonal output
        # columns, no XLA gathers afterwards).
        a_len = alen_ref[0, 0, 0]
        b_len = blen_ref[0, 0, :]
        kidx = jax.lax.broadcasted_iota(jnp.int32, (m + 1, TILE_R), 0)
        bs = bs_ref[0]
        vgap = jnp.where(kidx < b_len[None, :], -1, 0).astype(jnp.int32)
        hit_col = kidx == b_len[None, :]
        hit_d = a_len + b_len[None, :]          # (1, TILE_R) target diagonal

        # diagonal 0: cell (0,0) = 0 (plus border placeholders).  The b_len
        # comparison makes d0 lane-varying: otherwise Mosaic infers a
        # lane-replicated carry layout and fails to relayout `cur` into it
        # (b_len >= 0 is always true; it exists so layout inference can't
        # constant-fold the lane dependence away).
        d0 = jnp.where((kidx == 0) & (b_len[None, :] >= 0),
                       0, SENTINEL).astype(jnp.int32)
        e0 = 0 * d0                     # E(0,0) = 0
        w0 = jnp.full((m + 1, TILE_R), SENTINEL, jnp.int32) + 0 * d0
        # diagonal-0 hit (a_len == b_len == 0): dp = 0, E = 0 — the zero
        # init of the accumulators already encodes it
        acc0 = 0 * d0

        def step(d, head, carry):
            d_prev2, d_prev, w_prev, e_prev2, e_prev, dp_fin, e_fin = carry
            w = jnp.where(kidx == 0, head, jnp.roll(w_prev, 1, axis=0))
            s = jnp.where(w == bs, 0, -1).astype(jnp.int32)
            prev2_sh = jnp.where(kidx == 0, SENTINEL, jnp.roll(d_prev2, 1, axis=0))
            prev_sh = jnp.where(kidx == 0, SENTINEL, jnp.roll(d_prev, 1, axis=0))
            diag_in = prev2_sh + s
            vert_in = d_prev + vgap
            horiz_in = prev_sh - 1
            cur = jnp.maximum(diag_in, jnp.maximum(vert_in, horiz_in))
            # borders: col 0 (k==0) -> 0 ; row 0 (k==d) -> -d if d<=n else 0
            row0_val = jnp.where(d <= a_len, -d, 0)
            cur = jnp.where(kidx == 0, 0, cur)
            cur = jnp.where(kidx == d, row0_val, cur)
            # the walk's move priority: diagonal, then up, then left
            diag_ok = cur == diag_in
            up_ok = d_prev >= prev_sh
            e_diag = jnp.roll(e_prev2, 1, axis=0)
            e_left = jnp.roll(e_prev, 1, axis=0)
            e_cur = jnp.where(diag_ok, e_diag,
                              jnp.where(up_ok, e_prev, e_left))
            e_cur = jnp.where(kidx == 0, 0, e_cur)   # col-0 exit: adds 0
            e_cur = jnp.where(kidx == d, d, e_cur)   # row-0 exit at j = d
            hit = hit_col & (hit_d == d)
            dp_fin = jnp.where(hit, cur, dp_fin)
            e_fin = jnp.where(hit, e_cur, e_fin)
            return d_prev, cur, w, e_prev, e_cur, dp_fin, e_fin

        def block_step(blk, carry):
            # heads for d = 8*blk+1 .. 8*blk+8 are rap2[pad_l+n-d]; the 8 of
            # them are one 8-ALIGNED slice (pad_l and n are multiples of 8),
            # picked by static row index 7-r inside the block
            start = pl.multiple_of(pad_l + n - 8 * blk - 8, 8)
            head_block = rap_ref[0, pl.ds(start, 8), :]
            for r in range(8):
                carry = step(8 * blk + r + 1, head_block[7 - r:8 - r, :], carry)
            return carry

        init = (d0, d0, w0, e0, e0, acc0, acc0)
        *_, dp_fin, e_fin = jax.lax.fori_loop(0, n_blocks, block_step, init)
        # each lane's hit row is unique (k = b_len on its hit diagonal);
        # everything else stayed 0, so a sublane sum extracts it.  Fold in
        # the row-0 extent correction: + j_exit when j_exit <= a_len.
        score = dp_fin + jnp.where(e_fin <= a_len, e_fin, 0)
        score = jnp.where(hit_col, score, 0)
        out_ref[0, 0, 0:1, :] = jnp.sum(score, axis=0, keepdims=True)

    return kernel


def _kernel_factory_packed(n: int, m: int):
    """Packed-carry variant: dp, move priority, and the exit column E ride
    ONE int32 per cell, P = ((dp + OFF) << S) | (prio << E_BITS) | E, so
    the three-way move max selects dp first, then the walk's move priority,
    and E propagates for free in the low bits — half the rolls and selects
    of the unpacked kernel (measured ~1.3x at bench shapes).

    Priority encoding is exactly the oracle's walk order: diagonal (3) wins
    any tie; between vertical and horizontal the oracle compares RAW
    predecessors (d_prev >= prev_sh), which equals move-value order for
    band columns (vgap = -1, prio up=2 > left=1) but flips on ties in a
    read's FREE last column (vgap = 0) — there the up lane's priority is
    dropped to 0 so `left` wins equal move values, reproducing the
    reference's choice.  Bit range: needs 2*E_BITS + 3 <= 31, i.e.
    n + m < 2^14; _build_pallas_forward falls back to the unpacked kernel
    beyond that."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    assert n % 8 == 0, "candidate dim must be padded to a multiple of 8"
    n_diag = n + m
    pad_l = _pad_l(m)
    n_blocks = -(-n_diag // 8)
    E_BITS = max((n_diag + 1).bit_length(), 2)
    S = E_BITS + 2
    OFF = n_diag + 2
    assert S + (OFF + 1).bit_length() < 31

    def kernel(alen_ref, rap_ref, bs_ref, blen_ref, out_ref):
        a_len = alen_ref[0, 0, 0]
        b_len = blen_ref[0, 0, :]
        kidx = jax.lax.broadcasted_iota(jnp.int32, (m + 1, TILE_R), 0)
        bs = bs_ref[0]
        free_col = kidx >= b_len[None, :]     # vgap == 0 lanes
        hit_col = kidx == b_len[None, :]
        hit_d = a_len + b_len[None, :]
        # per-move packed deltas (dp delta << S | prio << E_BITS); E adds 0
        d_vert = jnp.where(free_col, 0 << S, (-1) << S) \
            + jnp.where(free_col, 0 << E_BITS, 2 << E_BITS)
        d_horiz = jnp.int32(((-1) << S) | (1 << E_BITS))
        d_match = jnp.int32(3 << E_BITS)
        d_mis = jnp.int32(((-1) << S) | (3 << E_BITS))
        NO_PRIO = jnp.int32(~(3 << E_BITS))   # strip prio bits of the source
        E_MASK = jnp.int32((1 << E_BITS) - 1)

        # diagonal 0: P(0,0) = OFF<<S (dp 0, E 0); rest sentinel 0.
        # b_len >= 0 keeps the carry lane-varying (see unpacked kernel note)
        d0 = jnp.where((kidx == 0) & (b_len[None, :] >= 0),
                       OFF << S, 0).astype(jnp.int32)
        w0 = jnp.full((m + 1, TILE_R), SENTINEL, jnp.int32) + 0 * d0
        acc0 = 0 * d0

        def step(d, head, carry):
            # carries hold dp|E with prio ALREADY STRIPPED (one mask at the
            # producer instead of three at the consumers); the rolled-in
            # wrap value only lands in row 0, whose cur is border-overridden
            # below, so the rolls need no row-0 masking
            p_prev2, p_prev, w_prev, fin = carry
            w = jnp.where(kidx == 0, head, jnp.roll(w_prev, 1, axis=0))
            prev2_sh = jnp.roll(p_prev2, 1, axis=0)
            prev_sh = jnp.roll(p_prev, 1, axis=0)
            diag_in = prev2_sh + jnp.where(w == bs, d_match, d_mis)
            vert_in = p_prev + d_vert
            horiz_in = prev_sh + d_horiz
            cur = jnp.maximum(diag_in, jnp.maximum(vert_in, horiz_in))
            # borders: col 0 -> dp 0 / E 0; row 0 -> dp (-d | 0) / E d
            row0_pack = (jnp.where(d <= a_len, OFF - d, OFF) << S) + d
            cur = jnp.where(kidx == 0, OFF << S, cur)
            cur = jnp.where(kidx == d, row0_pack, cur)
            hit = hit_col & (hit_d == d)
            fin = jnp.where(hit, cur, fin)
            return p_prev, cur & NO_PRIO, w, fin

        def block_step(blk, carry):
            start = pl.multiple_of(pad_l + n - 8 * blk - 8, 8)
            head_block = rap_ref[0, pl.ds(start, 8), :]
            for r in range(8):
                carry = step(8 * blk + r + 1, head_block[7 - r:8 - r, :], carry)
            return carry

        init = (d0, d0, w0, acc0)
        *_, fin = jax.lax.fori_loop(0, n_blocks, block_step, init)
        # unpack at the hit row (all other rows stayed 0, so sublane-sum
        # extracts the packed value); then dp + row-0 extent correction
        packed = jnp.sum(jnp.where(hit_col, fin, 0), axis=0, keepdims=True)
        dp = (packed >> S) - jnp.where(packed != 0, OFF, 0)
        e = packed & E_MASK
        score = dp + jnp.where(e <= a_len, e, 0)
        blv = b_len[None, :]
        score = jnp.where((blv >= 0) & (packed != 0), score, 0)
        out_ref[0, 0, 0:1, :] = score

    return kernel


@functools.lru_cache(maxsize=None)
def _build_pallas_forward(n: int, m: int, interpret: bool = False,
                          packed: bool = None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pad_l = _pad_l(m)
    n_diag_pad = _n_diag_pad(n, m)
    if packed is None:  # packed carry needs 2*E_BITS + 3 <= 31 bits
        packed = (n + m) < (1 << 13)
    kernel = _kernel_factory_packed(n, m) if packed else _kernel_factory(n, m)

    def forward(a_len_arr, rap, bs, blen):
        # a_len_arr: (C, 1, 1); rap: (C, pad_l + n, TILE_R);
        # bs: (T, m+1, TILE_R); blen: (T, 1, TILE_R)
        C = a_len_arr.shape[0]
        T = bs.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(C, T),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda c, t: (c, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, pad_l + n, TILE_R), lambda c, t: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m + 1, TILE_R), lambda c, t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, TILE_R), lambda c, t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, TILE_R),
                                   lambda c, t: (c, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, T, 1, TILE_R), jnp.int32),
            interpret=interpret,
        )(a_len_arr, rap, bs, blen)

    return forward


def nw_pair_scores_pallas(a_keys, a_len, b_keys, b_len, interpret: bool = False):
    """(C, R) traceback scores via the Pallas forward + XLA code walk.

    Same contract and bit-exact results as ops.nw_path.nw_pair_scores.
    R must be a multiple of TILE_R (pad reads with b_len == 0); the
    candidate dim n must be a multiple of 8 (encode_path_batch's pow2
    buckets satisfy both)."""
    import jax
    import jax.numpy as jnp

    C, n = a_keys.shape
    R, m = b_keys.shape
    assert R % TILE_R == 0, "pad reads to TILE_R"
    T = R // TILE_R
    if n % 8:  # block-slide needs an 8-multiple candidate dim
        extra = 8 - n % 8
        a_keys = jnp.concatenate(
            [jnp.asarray(a_keys, jnp.int32),
             jnp.full((C, extra), -1, jnp.int32)], axis=1)
        n += extra
    pad_l = _pad_l(m)

    rev = jnp.flip(a_keys.astype(jnp.int32), axis=1)
    pad = jnp.full((C, pad_l), SENTINEL, jnp.int32)
    rap = jnp.concatenate([pad, rev], axis=1)               # (C, pad_l + n)
    rap = jnp.broadcast_to(rap[:, :, None], (C, rap.shape[1], TILE_R))
    a_len_arr = a_len.astype(jnp.int32).reshape(C, 1, 1)

    bs = jnp.concatenate([jnp.full((R, 1), SENTINEL, jnp.int32),
                          b_keys.astype(jnp.int32)], axis=1)    # (R, m+1)
    bs = bs.reshape(T, TILE_R, m + 1).transpose(0, 2, 1)        # (T, m+1, TILE_R)
    blen = b_len.astype(jnp.int32).reshape(T, 1, TILE_R)

    fwd = _build_pallas_forward(n, m, interpret)
    from . import aot_cache

    out = aot_cache.call("nw_fwd", fwd, (a_len_arr, rap, bs, blen),
                         static=(n, m))           # (C, T, 1, TILE_R) scores
    return out.transpose(0, 1, 3, 2).reshape(C, R)


def nw_best_scores_pallas(a_keys, a_len, b_keys, b_len, interpret: bool = False):
    """max(forward, reverse-complement) scores via the Pallas forward.

    fw and rc batches are stacked into one 2R-row kernel invocation."""
    import jax.numpy as jnp

    from .nw_path import rc_keys_device

    both = jnp.concatenate([b_keys, rc_keys_device(b_keys, b_len)], axis=0)
    both_len = jnp.concatenate([b_len, b_len], axis=0)
    scores = nw_pair_scores_pallas(a_keys, a_len, both, both_len, interpret)
    R = b_keys.shape[0]
    return jnp.maximum(scores[:, :R], scores[:, R:])
