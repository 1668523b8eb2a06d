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
  * the A-window A[d-1-k] is a dynamic slice of a reversed padded copy of
    the candidate keys (prepared outside), shifting one sublane per step;
  * outputs: move codes (diagonal-major, int8) and per-diagonal dp values
    at each read's final column (dp[n][m] = dp value on diagonal
    a_len + b_len).

The traceback walk stays in XLA (Mosaic has no per-lane sublane gather);
it indexes codes by (d, k) = (ii + jj, jj).  Scores are bit-exact with the
row formulation and the host oracle (tests/test_nw.py).
"""

from __future__ import annotations

import functools

import numpy as np

TILE_R = 128
SENTINEL = -(1 << 20)  # A-window padding: never equals a key, dominates max


def _kernel_factory(n: int, m: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    n_diag = n + m
    rap_len = n + 2 * m

    def kernel(alen_ref, rap_ref, bs_ref, blen_ref, codes_ref, dpcol_ref):
        # alen_ref:  (1, 1, 1) int32 (SMEM) candidate length
        # rap_ref:   (1, rap_len, TILE_R) reversed padded A keys
        #            (pre-broadcast across lanes: Mosaic cannot relayout
        #             a sliced (m+1, 1) vector to replicated lanes)
        # bs_ref:    (1, m + 1, TILE_R) shifted read keys (row k = B[k-1])
        # blen_ref:  (1, 1, TILE_R) read lengths
        # codes_ref: (1, 1, n_diag, m + 1, TILE_R) int8 move codes
        # dpcol_ref: (1, 1, n_diag + 1, TILE_R) int32 dp at column b_len
        a_len = alen_ref[0, 0, 0]
        b_len = blen_ref[0, 0, :]
        kidx = jax.lax.broadcasted_iota(jnp.int32, (m + 1, TILE_R), 0)
        bs = bs_ref[0]
        vgap = jnp.where(kidx < b_len[None, :], -1, 0).astype(jnp.int32)
        col_at_blen = kidx == b_len[None, :]

        # diagonal 0: cell (0,0) = 0 (plus border placeholders).  The
        # 0*b_len term makes d0 lane-varying: otherwise Mosaic infers a
        # lane-replicated layout for the loop carry and fails to relayout
        # the non-replicated `cur` into it.
        # (b_len >= 0 is always true; the term exists only so layout
        # inference can't constant-fold the lane dependence away)
        d0 = jnp.where((kidx == 0) & (b_len[None, :] >= 0),
                       0, SENTINEL).astype(jnp.int32)
        dpcol_ref[0, 0, 0:1, :] = jnp.sum(jnp.where(col_at_blen, d0, 0),
                                          axis=0, keepdims=True)

        def step(d, carry):
            d_prev2, d_prev = carry
            # A window: W[k] = A[d-1-k] (SENTINEL outside A's extent)
            w = rap_ref[0, pl.ds(m + n - d, m + 1), :]
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
            diag_ok = cur == diag_in
            up_ok = d_prev >= prev_sh
            code = jnp.where(diag_ok, 0, jnp.where(up_ok, 1, 2)).astype(jnp.int8)
            codes_ref[0, 0, d - 1, :, :] = code
            dpcol_ref[0, 0, pl.ds(d, 1), :] = jnp.sum(
                jnp.where(col_at_blen, cur, 0), axis=0, keepdims=True)
            return d_prev, cur

        jax.lax.fori_loop(1, n_diag + 1, step, (d0, d0))

    return kernel


@functools.lru_cache(maxsize=None)
def _build_pallas_forward(n: int, m: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_diag = n + m
    rap_len = n + 2 * m
    kernel = _kernel_factory(n, m)

    def forward(a_len_arr, rap, bs, blen):
        # a_len_arr: (C, 1, 1); rap: (C, rap_len, 1); bs: (T, m+1, TILE_R);
        # blen: (T, 1, TILE_R)
        C = a_len_arr.shape[0]
        T = bs.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(C, T),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda c, t: (c, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, rap_len, TILE_R), lambda c, t: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m + 1, TILE_R), lambda c, t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, TILE_R), lambda c, t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, n_diag, m + 1, TILE_R),
                             lambda c, t: (c, t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n_diag + 1, TILE_R),
                             lambda c, t: (c, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((C, T, n_diag, m + 1, TILE_R), jnp.int8),
                jax.ShapeDtypeStruct((C, T, n_diag + 1, TILE_R), jnp.int32),
            ],
            interpret=interpret,
        )(a_len_arr, rap, bs, blen)

    return forward


def nw_pair_scores_pallas(a_keys, a_len, b_keys, b_len, interpret: bool = False):
    """(C, R) traceback scores via the Pallas forward + XLA code walk.

    Same contract and bit-exact results as ops.nw_path.nw_pair_scores.
    R must be a multiple of TILE_R (pad reads with b_len == 0)."""
    import jax
    import jax.numpy as jnp

    C, n = a_keys.shape
    R, m = b_keys.shape
    assert R % TILE_R == 0, "pad reads to TILE_R"
    T = R // TILE_R

    rev = jnp.flip(a_keys.astype(jnp.int32), axis=1)
    pad = jnp.full((C, m), SENTINEL, jnp.int32)
    rap = jnp.concatenate([pad, rev, pad], axis=1)          # (C, n+2m)
    rap = jnp.broadcast_to(rap[:, :, None], (C, rap.shape[1], TILE_R))
    a_len_arr = a_len.astype(jnp.int32).reshape(C, 1, 1)

    bs = jnp.concatenate([jnp.full((R, 1), SENTINEL, jnp.int32),
                          b_keys.astype(jnp.int32)], axis=1)    # (R, m+1)
    bs = bs.reshape(T, TILE_R, m + 1).transpose(0, 2, 1)        # (T, m+1, TILE_R)
    blen = b_len.astype(jnp.int32).reshape(T, 1, TILE_R)

    fwd = _build_pallas_forward(n, m, interpret)
    codes, dpcol = fwd(a_len_arr, rap, bs, blen)
    D, K = n + m, m + 1
    codes = codes.transpose(0, 1, 4, 2, 3).reshape(C, R, D * K)
    dpcol = dpcol.transpose(0, 1, 3, 2).reshape(C, R, D + 1)

    def walk(codes_c, dpcol_c, al):
        def cond(state):
            ii, jj = state
            return ((ii > 0) & (jj > 0)).any()

        def body(state):
            ii, jj = state
            interior = (ii > 0) & (jj > 0)
            idx = ((ii + jj - 1) * K + jj)[:, None]
            c = jnp.take_along_axis(codes_c, jnp.maximum(idx, 0), axis=1)[:, 0]
            ii = ii - jnp.where(interior & (c != 2), 1, 0)
            jj = jj - jnp.where(interior & (c != 1), 1, 0)
            return ii, jj

        ii0 = jnp.broadcast_to(al, (R,)).astype(jnp.int32)
        jj0 = b_len.astype(jnp.int32)
        ii, jj = jax.lax.while_loop(cond, body, (ii0, jj0))
        j_exit = jnp.where(ii == 0, jj, 0)
        # dp[n][m] lives on diagonal a_len + b_len at column b_len
        dp_nm = jnp.take_along_axis(dpcol_c, (al + jj0)[:, None], axis=1)[:, 0]
        return dp_nm + jnp.where(j_exit <= al, j_exit, 0)

    return jax.vmap(walk)(codes, dpcol, a_len.astype(jnp.int32))


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
