"""Banded pairwise scorer: identical to the full pairwise DP whenever the
optimal alignment stays in-band, and edge/low-score detection for the
out-of-band fallback."""

import numpy as np
import pytest

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


def _mini_arena_fixture():
    """A small graph + registered candidate paths (incl. overlap drops and
    reverse orientations) + reads, via the production _DevicePools."""
    import random as pyrandom

    from gfalign_tpu.engine.graph_align import (_DevicePools, build_oriented,
                                                overlap_table)
    from gfalign_tpu.graph.model import Graph, Link
    from gfalign_tpu.io.fastq import encode_seq

    rng = pyrandom.Random(23)
    graph = Graph()
    lens = [40, 55, 33, 64, 48, 37]
    for i, ln in enumerate(lens):
        graph.add_segment(f"m{i}", "".join(rng.choice("ACGT")
                                           for _ in range(ln)))
    graph.links.append(Link(0, "+", 1, "+", "3M"))   # overlap drop
    graph.links.append(Link(1, "+", 2, "+", "0M"))
    graph.links.append(Link(2, "+", 3, "+", "5M"))
    graph.links.append(Link(3, "+", 4, "+", "0M"))
    graph.links.append(Link(4, "+", 5, "+", "2M"))
    lut = overlap_table(graph)
    step_sets = [
        [(0, "+"), (1, "+"), (2, "+")],
        [(1, "+"), (2, "+"), (3, "+"), (4, "+")],
        [(5, "-"), (4, "-"), (3, "-")],              # reverse walk
        [(2, "+"), (3, "+"), (4, "+"), (5, "+")],
        [(3, "+")],                                  # single step
    ]
    ops = [build_oriented(graph, s, lut) for s in step_sets]
    nprng = np.random.default_rng(31)
    reads = []
    for i, op in enumerate(ops):
        codes = encode_seq(op.seq)
        a = int(nprng.integers(0, max(1, len(codes) - 30)))
        seq = codes[a:a + 40].copy()
        if len(seq) > 10:
            seq[5] = (seq[5] + 1) % 4
        reads.append(seq)
    reads.append(nprng.integers(0, 4, 24).astype(np.int8))  # junk read
    pools = _DevicePools(reads, graph)
    rows = [pools.path_idx(tuple(s), op)
            for s, op in zip(step_sets, ops)]
    pools.sync_paths()
    assert all(r is not None for r in rows)
    return pools, ops, reads, rows


def test_arena_strip_assembly_matches_host():
    """Device-assembled strips (segment arena + per-path step tables) are
    byte-equal to strips sliced from the host-built path sequences."""
    from gfalign_tpu.io.fastq import encode_seq
    from gfalign_tpu.ops.seqalign import assemble_strip

    pools, ops, reads, rows = _mini_arena_fixture()
    n_cols, w2, shift = 96, 16, 1
    N = 64
    rng = np.random.default_rng(7)
    pidx = rng.integers(0, len(rows), N).astype(np.int32)
    deltas = rng.integers(-30, 120, N).astype(np.int32)
    import jax.numpy as jnp
    co = jnp.take(pools.cum_off, pidx, axis=0)
    bp = jnp.take(pools.base_ptr, pidx, axis=0)
    pl = jnp.take(pools.plen, pidx)
    got = np.asarray(assemble_strip(pools.arena, co, bp, pl, deltas,
                                    n_cols, shift, w2))
    for n in range(N):
        codes = encode_seq(ops[pidx[n]].seq)
        want = np.full(n_cols, PAD, np.int8)
        for t in range(n_cols):
            x = t + int(deltas[n]) - w2 - shift
            if 0 <= x < len(codes):
                want[t] = codes[x]
        np.testing.assert_array_equal(got[n], want, err_msg=f"pair {n}")


def test_banded_arena_scores_matches_host_arrays():
    """banded_arena_scores (XLA path on CPU) == _banded_forward over the
    equivalent host-gathered (read, path) code arrays."""
    import jax

    from gfalign_tpu.io.fastq import encode_seq
    from gfalign_tpu.ops.seqalign import _banded_forward, banded_arena_scores

    pools, ops, reads, rows = _mini_arena_fixture()
    W, N = 16, 128
    rng = np.random.default_rng(11)
    ridx = rng.integers(0, len(reads), N).astype(np.int32)
    pidx_t = rng.integers(0, len(rows), N)
    pidx = np.array([rows[i] for i in pidx_t], np.int32)
    deltas = rng.integers(-40, 160, N).astype(np.int32)
    got = [np.asarray(v) for v in banded_arena_scores(
        pools.arena, pools.cum_off, pools.base_ptr, pools.plen,
        pools.reads, ridx, pidx, deltas, width=W)]
    lr = pools.lr_cap
    lp = max(len(op.seq) for op in ops)
    rc = np.full((N, lr), PAD, np.int8)
    pc = np.full((N, lp), PAD, np.int8)
    for n in range(N):
        rd = reads[ridx[n]]
        rc[n, :len(rd)] = rd
        codes = encode_seq(ops[pidx_t[n]].seq)
        pc[n, :len(codes)] = codes
    want = [np.asarray(v) for v in jax.jit(
        lambda r, p, d: _banded_forward(r, p, d, width=W))(rc, pc, deltas)]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_banded_arena_pallas_parity():
    """The Pallas banded arena kernel (interpret mode on CPU) is bit-exact
    vs the XLA arena scan, including tie-breaks, PADs, and off-band
    deltas."""
    from gfalign_tpu.ops.seqalign import _jitted_banded_arena
    from gfalign_tpu.ops.seqalign_pallas import banded_arena_scores_pallas

    pools, ops, reads, rows = _mini_arena_fixture()
    W, N = 16, 128
    rng = np.random.default_rng(13)
    ridx = rng.integers(0, len(reads), N).astype(np.int32)
    pidx = np.array([rows[int(i)] for i in rng.integers(0, len(rows), N)],
                    np.int32)
    deltas = rng.integers(-40, 160, N).astype(np.int32)
    args = (pools.arena, pools.cum_off, pools.base_ptr, pools.plen,
            pools.reads, ridx, pidx, deltas)
    want = [np.asarray(v) for v in _jitted_banded_arena(W)(*args)]
    got = [np.asarray(v) for v in banded_arena_scores_pallas(
        *args, W, interpret=True)]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_overlong_overlap_path_is_irregular():
    """Overlap longer than the successor segment: build_oriented_codes must
    report the CLAMPED n_bases (= len(codes)) so _DevicePools.path_idx's
    unclamped-recurrence guard rejects the path and the caller takes the
    exact host-DP fallback (ADVICE r3: the guard was dead for code-built
    paths when n_bases carried the same unclamped pos)."""
    from gfalign_tpu.engine.graph_align import (_DevicePools, _SegCodes,
                                                build_oriented_codes,
                                                overlap_table)
    from gfalign_tpu.graph.model import Graph, Link

    graph = Graph()
    graph.add_segment("a", "ACGTACGTAC")       # 10 bp
    graph.add_segment("b", "GTT")              # 3 bp, overlap 5 > len
    graph.links.append(Link(0, "+", 1, "+", "5M"))
    lut = overlap_table(graph)
    steps = [(0, "+"), (1, "+")]
    op, codes = build_oriented_codes(graph, steps, lut, _SegCodes(graph))
    assert len(op) == len(codes) == 10          # clamped, not 10 + 3 - 5
    pools = _DevicePools([np.zeros(8, np.int8)], graph)
    assert pools.path_idx(tuple(steps), op) is None
    assert tuple(steps) in pools.irregular


def test_assemble_strip_rolled_matches_unrolled(monkeypatch):
    """Above _STRIP_UNROLL_S assemble_strip switches to a lax.fori_loop of
    the same compare-selects; both forms must produce identical strips."""
    from gfalign_tpu.ops import seqalign

    pools, ops, reads, rows = _mini_arena_fixture()
    args = (pools.arena, pools.cum_off, pools.base_ptr, pools.plen,
            np.arange(-8, -8 + pools.cum_off.shape[0], dtype=np.int32),
            48, 3, 7)
    unrolled = np.asarray(seqalign.assemble_strip(*args))
    monkeypatch.setattr(seqalign, "_STRIP_UNROLL_S", 1)
    rolled = np.asarray(seqalign.assemble_strip(*args))
    np.testing.assert_array_equal(rolled, unrolled)


@pytest.mark.parametrize("seed", range(5))
def test_native_banded_pairs_matches_xla(seed):
    """The native host banded scorer is bit-exact vs the XLA
    _banded_forward at random shapes, deltas, and mid-read PAD masks."""
    from gfalign_tpu.io import native
    from gfalign_tpu.ops import seqalign

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(400 + seed)
    N, W = 24, 16
    lr = int(rng.integers(8, 60))
    lp = int(rng.integers(8, 90))
    reads = rng.integers(0, 5, (N, lr)).astype(np.int8)
    # mid-read PAD masking (placement rounds mask accepted regions)
    for i in range(0, N, 3):
        a = int(rng.integers(0, lr))
        b = int(rng.integers(a, lr))
        reads[i, a:b] = seqalign.PAD
    paths = rng.integers(0, 5, (N, lp)).astype(np.int8)
    deltas = rng.integers(-20, 20, N).astype(np.int32)
    want = seqalign.banded_pair_scores(reads, paths, deltas, width=W)
    ro = np.arange(N, dtype=np.int64) * lr
    po = np.arange(N, dtype=np.int64) * lp
    got = native.seq_banded_pairs(
        reads.reshape(-1), ro, np.full(N, lr, np.int64),
        paths.reshape(-1), po, np.full(N, lp, np.int64),
        np.arange(N, dtype=np.int32), np.arange(N, dtype=np.int32), deltas,
        W, seqalign.MATCH, seqalign.MISMATCH, seqalign.GAP,
        seqalign.PAD, seqalign._BLOCK)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_engine_parity_e2e_host_vs_device():
    """END-TO-END engine parity: full CLI align with the host native
    ladder vs GFALIGN_TPU_ALIGN_DEVICE=1 (XLA device kernels on the CPU
    backend) must emit byte-identical GAF on random workloads — the
    contract that makes engine selection transparent."""
    import os
    import subprocess
    import sys
    import tempfile

    from gfalign_tpu.synth import make_workload, write_workload

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for seed in (41, 46):
        with tempfile.TemporaryDirectory() as d:
            wl = make_workload(seed=seed, n_segments=120, n_reads=10,
                               seg_len=(120, 400), read_len=(300, 900),
                               sub_rate=0.01, ins_rate=0.002,
                               del_rate=0.002)
            paths = write_workload(wl, d)
            outs = {}
            for eng, extra in (("host", {}),
                               ("device", {"GFALIGN_TPU_ALIGN_DEVICE": "1"})):
                out = f"{d}/{eng}.gaf"
                p = subprocess.run([sys.executable, "-c",
                    "import sys; sys.path.insert(0, %r);"
                    "import jax; jax.config.update('jax_platforms','cpu');"
                    "from gfalign_tpu.cli.main import main;"
                    "main(['align','-f',%r,'-r',%r,'-o',%r])"
                    % (repo, paths["gfa"], paths["reads"], out)],
                    env={**os.environ, **extra}, capture_output=True,
                    text=True, timeout=300)
                assert p.returncode == 0, p.stderr[-400:]
                outs[eng] = open(out, "rb").read()
            assert outs["host"].count(b"\n") > 0
            assert outs["host"] == outs["device"]
