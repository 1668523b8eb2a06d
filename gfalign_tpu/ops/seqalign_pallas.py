"""Pallas TPU kernel for the align-mode local-alignment forward pass.

Anti-diagonal formulation of ops/seqalign.local_forward (same recurrence,
match +1 / mismatch -2 / linear gap -3, floor at 0):

    H_d[k] = max(0, H_{d-2}[k-1] + S(d-k, k),
                    H_{d-1}[k] + G, H_{d-1}[k-1] + G)

No intra-step dependency (the horizontal predecessor lives on the previous
diagonal), so each step is pure VPU work — the row formulation's log(Lp)
cummax disappears.

Best-cell tie-breaking matches the row kernel exactly: smallest end row i,
then smallest end column j.  Encoded as a packed key v*(Lr+2) - i updated
strictly-greater: a (v, i) tie keeps the earlier diagonal, which is the
smaller j.

Layout per kernel instance (grid = (n_reads, n_paths)): path offset k on
sublanes (Lp+1), a single (read, path) pair per program, lanes used for
k-vector parallelism... no: k on sublanes requires the lane dim too, so k
is split (sublane, lane) as a (ceil((Lp+1)/128), 128) 2D layout?  Simpler
and efficient: reads on lanes (TILE 128), one path per grid column —
mirrors nw_pallas.
"""

from __future__ import annotations

import functools

import numpy as np

from .seqalign import GAP, MATCH, MISMATCH, PAD, _BLOCK

TILE_R = 128
SENT = -(1 << 20)
# the (lp+1, TILE_R) wavefront state (5 carries + path codes + read window)
# outgrows Mosaic's default 16 MB scoped-vmem at align-mode path lengths;
# raise the limit and gate truly extreme shapes back to the XLA kernel
VMEM_LIMIT = 100 * 1024 * 1024


def _vmem_estimate(lr: int, lp: int) -> int:
    lr_pad = (-(-(lr + lp) // 8)) * 8
    per_row = TILE_R * 4
    return (lr_pad + 7 * (lp + 1)) * per_row   # rc + ps + 5 carries + slack


def shapes_fit(lr: int, lp: int) -> bool:
    # hard area ceiling: (8192, 16384) crashes the TPU worker outright
    # (kernel fault during compile/run, measured on v5e) even though the
    # vmem estimate passes; (4096, 8192) is the largest proven-good shape
    if lr * lp > 4096 * 8192:
        return False
    return _vmem_estimate(lr, lp) <= int(VMEM_LIMIT * 0.9)


def _kernel_factory(lr: int, lp: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    n_diag = lr + lp
    lr_pad = (-(-n_diag // 8)) * 8   # rows available for aligned 8-slices
    # pow2 so the final (v, i) unpack is shift/mask, not int division
    key_bits = max(lr + 2, 2).bit_length()
    KEY_SCALE = 1 << key_bits

    def kernel(rc_ref, ps_ref, out_ref):
        # rc_ref:  (1, lr_pad, TILE_R) read codes (PAD rows beyond lr),
        #          one read per lane
        # ps_ref:  (1, lp + 1, TILE_R) shifted path codes (row k = path[k-1];
        #          lane-broadcast when the path is shared, or per-lane for
        #          pairwise mode — the kernel is elementwise in lanes)
        # out_ref: (1, 1, 4, TILE_R) int32: best, bi, bj, (pad)
        #
        # The A-window W_d[k] = read[d-1-k] is CARRIED and rolled one
        # sublane per step (a per-step dynamic slice of the full window is
        # an unaligned (lp+1)-row relayout and dominates runtime).
        #
        # PERF INVARIANT: every loop carry is a 2-D (lp+1, TILE_R) vector and
        # there are NO reductions inside the loop.  The first version of this
        # kernel reduced the selection key over sublanes each step and
        # carried 1-D (TILE_R,) bests — Mosaic handles 1-D carries ~1000x
        # slower (734 ms vs 0.7 ms at 64x64); best (key, d) are tracked
        # per-(sublane, lane) and reduced ONCE after the loop.
        kidx = jax.lax.broadcasted_iota(jnp.int32, (lp + 1, TILE_R), 0)
        ps = ps_ref[0]

        # all-zero init that DEPENDS on the per-lane read data: the
        # comparison can't be constant-folded, so Mosaic infers a
        # lane-varying layout for the loop carry (cf. ops/nw_pallas.py)
        d0 = jnp.where(rc_ref[0, pl.ds(0, 1), :] < SENT, 1, 0).astype(jnp.int32)
        d0 = jnp.broadcast_to(d0, (lp + 1, TILE_R)) + 0 * kidx
        w0 = jnp.full((lp + 1, TILE_R), PAD, jnp.int32) + 0 * d0

        def block_step(blk, carry):
            # 8 diagonals per outer step: the head rows for d = 8*blk+1 ..
            # 8*blk+8 are an 8-SUBLANE-ALIGNED slice of the read codes
            # (Mosaic crashes on per-step unaligned single-row slices)
            start = pl.multiple_of(blk * 8, 8)
            head_block = rc_ref[0, pl.ds(start, 8), :]          # (8, TILE_R)
            for r in range(8):
                carry = step(blk * 8 + r + 1, head_block[r:r + 1, :], carry)
            return carry

        def step(d, head, carry):
            h_prev2, h_prev, w_prev, best_key, best_d = carry
            # roll the window down one sublane; new head = read[d-1]
            head = jnp.where(d <= lr, head, PAD)
            w = jnp.where(kidx == 0, head, jnp.roll(w_prev, 1, axis=0))
            is_pad = (w == PAD) | (ps == PAD) | (w < 0) | (ps < 0)
            match = (~is_pad) & (w < 4) & (ps < 4) & (w == ps)
            s = jnp.where(is_pad, _BLOCK,
                          jnp.where(match, MATCH, MISMATCH)).astype(jnp.int32)
            prev2_sh = jnp.where(kidx == 0, SENT, jnp.roll(h_prev2, 1, axis=0))
            prev_sh = jnp.where(kidx == 0, SENT, jnp.roll(h_prev, 1, axis=0))
            cur = jnp.maximum(
                0, jnp.maximum(prev2_sh + s,
                               jnp.maximum(h_prev + GAP, prev_sh + GAP)))
            cur = jnp.where(kidx == 0, 0, cur)
            cur = jnp.where(kidx == d, 0, cur)          # row 0 (i == 0)
            cur = jnp.where(kidx > d, 0, cur)           # invalid region
            # packed selection key: value major, smaller i (= d - k) wins ties
            i_row = d - kidx
            key = cur * KEY_SCALE - i_row
            key = jnp.where((kidx > 0) & (kidx <= jnp.minimum(d - 1, lp)),
                            key, SENT)
            improved = key > best_key                    # strict: earliest d
            best_d = jnp.where(improved, d, best_d)
            best_key = jnp.maximum(best_key, key)
            return h_prev, cur, w, best_key, best_d

        init = (0 * d0, 0 * d0, w0, d0 + SENT, 0 * d0)
        n_blocks = -(-n_diag // 8)
        _, _, _, best_key, best_d = jax.lax.fori_loop(0, n_blocks, block_step, init)
        # one cross-sublane reduction AFTER the loop: winner = max key
        # (= max v, then min end row i); among equal keys the smallest
        # diagonal d = i + k wins, i.e. the smallest end column j
        top = jnp.max(best_key, axis=0, keepdims=True)             # (1, TILE_R)
        d_win = jnp.min(jnp.where(best_key == top, best_d, 1 << 24),
                        axis=0, keepdims=True)                      # (1, TILE_R)
        # unpack the winning (value, end row); end column = diagonal - row
        best_v = jnp.where(top == SENT, 0,
                           (top + KEY_SCALE - 1) >> key_bits)
        best_i = best_v * KEY_SCALE - top
        best_j = d_win - best_i
        # match the XLA row kernel: a best of 0 reports end cell (0, 0)
        ok = best_v > 0
        out_ref[0, 0, 0:1, :] = jnp.where(ok, best_v, 0)
        out_ref[0, 0, 1:2, :] = jnp.where(ok, best_i, 0)
        out_ref[0, 0, 2:3, :] = jnp.where(ok, best_j, 0)
        out_ref[0, 0, 3:4, :] = 0 * best_v

    return kernel


@functools.lru_cache(maxsize=None)
def _build_forward(lr: int, lp: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _kernel_factory(lr, lp)
    lr_pad = (-(-(lr + lp) // 8)) * 8

    # jit is LOAD-BEARING: an un-jitted pallas_call built inside the
    # function re-traces and re-lowers on every invocation (~600 ms/call
    # of host+tunnel work vs 0.1 ms for the kernel itself)
    @functools.partial(jax.jit, static_argnames=())
    def forward(rc, ps):
        # rc: (T, lr_pad, TILE_R) read codes, one read per lane
        # ps: (P, lp + 1, TILE_R) path codes (lane-broadcast)
        T = rc.shape[0]
        P = ps.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(T, P),
            in_specs=[
                pl.BlockSpec((1, lr_pad, TILE_R), lambda t, p: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lp + 1, TILE_R), lambda t, p: (p, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 4, TILE_R), lambda t, p: (t, p, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, P, 4, TILE_R), jnp.int32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
            interpret=interpret,
        )(rc, ps)

    return forward


def _pack_reads(read_codes: np.ndarray, lr: int, lp: int, T: int):
    lr_pad = (-(-(lr + lp) // 8)) * 8
    rc = np.full((T * TILE_R, lr_pad), PAD, dtype=np.int32)
    rc[:len(read_codes), :lr] = read_codes.astype(np.int32)
    return rc.reshape(T, TILE_R, lr_pad).transpose(0, 2, 1).copy()


def local_forward_pallas(read_codes: np.ndarray, path_codes: np.ndarray,
                         interpret: bool = False):
    """Drop-in for ops.seqalign.local_forward: (best, bi, bj) each (R, P).

    read_codes: (R, Lr) int8, path_codes: (P, Lp) int8.  R is padded to
    TILE_R internally."""
    import jax.numpy as jnp

    R, lr = read_codes.shape
    P, lp = path_codes.shape
    T = -(-R // TILE_R)
    rc = _pack_reads(read_codes, lr, lp, T)

    ps = np.full((P, lp + 1), PAD, dtype=np.int32)
    ps[:, 1:] = path_codes.astype(np.int32)
    ps = np.broadcast_to(ps[:, :, None], (P, lp + 1, TILE_R)).copy()

    fwd = _build_forward(lr, lp, interpret)
    from . import aot_cache

    out = np.asarray(aot_cache.call(
        "sa_fwd", fwd, (jnp.asarray(rc), jnp.asarray(ps)),
        static=(lr, lp)))  # (T, P, 4, TILE_R)
    out = out.transpose(0, 3, 1, 2).reshape(T * TILE_R, P, 4)[:R]
    return out[:, :, 0], out[:, :, 1], out[:, :, 2]


# ---------------------------------------------------------------------------
# Banded pairwise forward (the seeded aligner's production inner loop)
# ---------------------------------------------------------------------------
#
# Row formulation of ops/seqalign._banded_forward in Pallas: band offset u
# on sublanes (width rows), pairs on lanes (TILE_R).  The horizontal
# dependency within a row is the max-plus prefix chain, computed as a
# log2(width) sublane roll-doubling cummax; every other input is elementwise.
# The path strip (strip[n, t] = path[n, t + delta - W/2], PAD outside) is
# extracted by XLA from the device pools and fed as a kernel operand; the
# kernel carries a (width, TILE_R) window of it, rolled one sublane per row
# with the incoming tail fetched from 8-aligned blocks (same pattern as the
# A-window of the cross/pairwise kernels above).
#
# Bit-exact vs _banded_forward including tie-breaks: per-sublane packed keys
# v * 2^IB - i track (max value, earliest row) per band lane; the
# post-loop reduction takes the max key, then the smallest u among equal
# keys — which equals the XLA scan's "first improving row, then first
# argmax lane" selection (tests/test_align_banded.py::test_pallas_parity).


def banded_shapes_fit(lr: int, width: int) -> bool:
    # carries: 3 x (width, TILE_R) int32 + strip/read operands
    per_row = TILE_R * 4
    need = (3 * width + (lr + width + 16) + (-(-lr // 8)) * 8 + 8) * per_row
    return need <= int(VMEM_LIMIT * 0.9) and (lr + 2) * (lr + 2) < (1 << 30)


def _banded_kernel_factory(lr: int, width: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    assert width % 8 == 0 and lr % 8 == 0
    W2 = width // 2
    n_blocks = lr // 8
    # packed selection key: value major, then earliest row i (strict >)
    key_bits = max(lr + 2, 2).bit_length()
    KEY_SCALE = 1 << key_bits
    assert (lr + 1) * KEY_SCALE < (1 << 31)
    n_shifts = (width - 1).bit_length()   # cummax roll-doubling steps

    def kernel(rc_ref, st_ref, dl_ref, pl_ref, out_ref):
        # rc_ref:  (1, lr, TILE_R) read codes, one PAIR per lane
        # st_ref:  (1, strip_pad, TILE_R) path strip rows (strip[t] for the
        #          pair on that lane; strip_pad = ceil8(lr + width))
        # dl_ref:  (1, 1, TILE_R) int32 deltas
        # pl_ref:  (1, 1, TILE_R) int32 true path lengths (in-path bound)
        # out_ref: (1, 1, 4, TILE_R) int32: best, bi, u_win, edge-ignored
        kidx = jax.lax.broadcasted_iota(jnp.int32, (width, TILE_R), 0)
        delta = dl_ref[0, 0:1, :]                       # (1, TILE_R)
        plen = pl_ref[0, 0:1, :]                        # (1, TILE_R)
        decay = (-GAP) * kidx                           # -GAP*u >= 0

        # lane-varying all-zero inits (cf. the cross kernel's d0 trick)
        z0 = jnp.where(rc_ref[0, pl.ds(0, 1), :] < SENT, 1, 0).astype(jnp.int32)
        z0 = jnp.broadcast_to(z0, (width, TILE_R)) + 0 * kidx
        # st_ref row t holds strip[t - 1] (the wrapper shifts by one), so
        # the PRE-row-1 window is st rows 0..width-1 = strip[-1..width-2];
        # the first in-loop roll then lands on strip[0..width-1] with the
        # tail fetched from the 8-aligned block at st row width
        win0 = st_ref[0, pl.ds(0, width), :] + 0 * z0

        def row(i1, rhead, tail, carry):
            # i1 = 1-based row; rhead/tail: (1, TILE_R) read char / new
            # strip entry strip[i1 + width - 2] (= st row i1 + width - 1)
            h_prev, win, best_key = carry
            win = jnp.where(kidx == width - 1, tail,
                            jnp.roll(win, -1, axis=0))
            r = rhead                                   # broadcast (1,TILE_R)
            is_pad = (r == PAD) | (win == PAD) | (r < 0) | (win < 0)
            match = (~is_pad) & (r < 4) & (win < 4) & (r == win)
            s = jnp.where(is_pad, _BLOCK,
                          jnp.where(match, MATCH, MISMATCH)).astype(jnp.int32)
            up = jnp.where(kidx == width - 1, SENT,
                           jnp.roll(h_prev, -1, axis=0))
            c = jnp.maximum(0, jnp.maximum(h_prev + s, up + GAP))
            j_of_u = i1 + delta - W2 + kidx             # (width, TILE_R)
            in_path = (j_of_u >= 1) & (j_of_u <= plen)
            c = jnp.where(in_path, c, 0)
            # horizontal max-plus chain: cummax(c - GAP*u) + GAP*u via
            # log2(width) sublane roll-doubling steps
            z = c + decay
            sh = 1
            for _ in range(n_shifts):
                t = jnp.where(kidx < sh, SENT, jnp.roll(z, sh, axis=0))
                z = jnp.maximum(z, t)
                sh *= 2
            hn = z - decay
            hn = jnp.where(in_path, hn, 0)
            key = hn * KEY_SCALE - i1
            best_key = jnp.maximum(best_key, key)
            return hn, win, best_key

        def block_step(blk, carry):
            start = pl.multiple_of(blk * 8, 8)
            rhead_block = rc_ref[0, pl.ds(start, 8), :]
            tail_block = st_ref[0, pl.ds(start + width, 8), :]
            for r in range(8):
                carry = row(blk * 8 + r + 1, rhead_block[r:r + 1, :],
                            tail_block[r:r + 1, :], carry)
            return carry

        init = (0 * z0, win0, 0 * z0)
        _, _, best_key = jax.lax.fori_loop(0, n_blocks, block_step, init)
        # reduce once after the loop: max key, then smallest u among equals
        top = jnp.max(best_key, axis=0, keepdims=True)          # (1, TILE_R)
        u_win = jnp.min(jnp.where(best_key == top, kidx, 1 << 24),
                        axis=0, keepdims=True)
        best_v = jnp.where(top > 0, (top + KEY_SCALE - 1) >> key_bits, 0)
        best_i = jnp.where(top > 0, best_v * KEY_SCALE - top, 0)
        out_ref[0, 0, 0:1, :] = best_v
        out_ref[0, 0, 1:2, :] = best_i
        out_ref[0, 0, 2:3, :] = jnp.where(top > 0, u_win, 0)
        out_ref[0, 0, 3:4, :] = 0 * best_v

    return kernel


@functools.lru_cache(maxsize=None)
def _build_banded_arena(lr: int, width: int, interpret: bool = False):
    """jit-compiled: gather pair metadata, assemble strips on device from
    the oriented-segment arena (path BYTES never leave the device), run
    the banded Pallas kernel; returns (best, bi, bj, edge) like
    ops.seqalign._banded_forward."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .seqalign import assemble_strip

    kernel = _banded_kernel_factory(lr, width)
    strip_pad = (-(-(lr + width) // 8)) * 8 + 8  # +8: tail block slack
    W2 = width // 2

    @jax.jit
    def fn(arena, cum_off, base_ptr, plens, read_pool, read_idx, path_idx,
           deltas):
        N = read_idx.shape[0]
        T = N // TILE_R
        rc = jnp.take(read_pool, read_idx, axis=0,
                      mode="clip").astype(jnp.int32)          # (N, lr)
        co = jnp.take(cum_off, path_idx, axis=0, mode="clip")
        bp = jnp.take(base_ptr, path_idx, axis=0, mode="clip")
        plv = jnp.take(plens, path_idx, mode="clip")
        # st row t = strip[t - 1] (shift=1): one leading pad row keeps the
        # in-kernel tail fetches 8-aligned (see the kernel's win0 comment)
        strip = assemble_strip(arena, co, bp, plv, deltas, strip_pad,
                               shift=1, w2=W2).astype(jnp.int32)
        rck = rc.reshape(T, TILE_R, lr).transpose(0, 2, 1)
        stk = strip.reshape(T, TILE_R, strip_pad).transpose(0, 2, 1)
        dlk = deltas.astype(jnp.int32).reshape(T, 1, TILE_R)
        plk = plv.astype(jnp.int32).reshape(T, 1, TILE_R)
        out = pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, lr, TILE_R), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, strip_pad, TILE_R), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, TILE_R), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, TILE_R), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 4, TILE_R), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, 1, 4, TILE_R), jnp.int32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
            interpret=interpret,
        )(rck, stk, dlk, plk)
        out = out.transpose(0, 3, 1, 2).reshape(N, 4)
        best, bi, u_win = out[:, 0], out[:, 1], out[:, 2]
        okv = best > 0
        bj = jnp.where(okv, bi + deltas - W2 + u_win, 0)
        edge = okv & ((u_win <= 0) | (u_win >= width - 1))
        return (jnp.where(okv, best, 0), jnp.where(okv, bi, 0), bj, edge)

    return fn


def banded_arena_scores_pallas(arena, cum_off, base_ptr, plens, read_pool,
                               read_idx, path_idx, deltas, width: int,
                               interpret: bool = False):
    """Drop-in for seqalign._jitted_banded_arena's device path: (best, bi,
    bj, edge) over pairs (read_pool[read_idx[n]], assembled path
    path_idx[n]).  N must be a multiple of TILE_R."""
    lr = read_pool.shape[1]
    fn = _build_banded_arena(lr, width, interpret)
    from . import aot_cache

    return aot_cache.call(
        "sa_banded_arena", fn,
        (arena, cum_off, base_ptr, plens, read_pool, read_idx, path_idx,
         deltas), static=(lr, width))


@functools.lru_cache(maxsize=None)
def _build_forward_pairs(lr: int, lp: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _kernel_factory(lr, lp)
    lr_pad = (-(-(lr + lp) // 8)) * 8

    # jit is LOAD-BEARING, see _build_forward
    @jax.jit
    def forward(rc, ps):
        # rc: (T, lr_pad, TILE_R) one read per lane
        # ps: (T, lp + 1, TILE_R) one PATH per lane (the kernel is purely
        #     elementwise in lanes, so per-lane paths give pairwise mode)
        T = rc.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(T, 1),
            in_specs=[
                pl.BlockSpec((1, lr_pad, TILE_R), lambda t, p: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lp + 1, TILE_R), lambda t, p: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 4, TILE_R), lambda t, p: (t, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, 1, 4, TILE_R), jnp.int32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
            interpret=interpret,
        )(rc, ps)

    return forward


def local_forward_pairs_pallas(read_codes: np.ndarray, path_codes: np.ndarray,
                               interpret: bool = False):
    """Drop-in for ops.seqalign.local_forward_pairs: row i of reads vs row i
    of paths only; (best, bi, bj) each (N,)."""
    import jax.numpy as jnp

    N, lr = read_codes.shape
    _, lp = path_codes.shape
    T = -(-N // TILE_R)
    rc = _pack_reads(read_codes, lr, lp, T)

    ps = np.full((T * TILE_R, lp + 1), PAD, dtype=np.int32)
    ps[:N, 1:] = path_codes.astype(np.int32)
    ps = ps.reshape(T, TILE_R, lp + 1).transpose(0, 2, 1).copy()

    fwd = _build_forward_pairs(lr, lp, interpret)
    from . import aot_cache

    out = np.asarray(aot_cache.call(
        "sa_pairs", fwd, (jnp.asarray(rc), jnp.asarray(ps)),
        static=(lr, lp)))  # (T, 1, 4, TILE_R)
    out = out.transpose(0, 3, 1, 2).reshape(T * TILE_R, 4)[:N]
    return out[:, 0], out[:, 1], out[:, 2]
