"""One-command validation of every REAL-TPU production path.

The pytest suite pins all kernels bit-exact in interpret mode on CPU
(tests/conftest.py forces the cpu backend); this script drives the same
paths on the actual device — Mosaic-compiled kernels, the shard_map step,
and the CLI end-to-end — and is what a round's TPU sign-off runs:

    PYTHONPATH=/root/repo python tools/tpu_smoke.py

Exits non-zero on any mismatch.  Each check prints PASS with a short tag.
"""

import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
REFERENCE = pathlib.Path("/root/reference")

import numpy as np  # noqa: E402


def check(tag, ok):
    print(("PASS " if ok else "FAIL ") + tag)
    if not ok:
        sys.exit(1)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}")
    rng = np.random.default_rng(11)

    # 1. NW Pallas (score-emitting) == XLA row kernel, varying lengths
    from gfalign_tpu.ops.nw_pallas import nw_best_scores_pallas
    from gfalign_tpu.ops.nw_path import nw_best_scores

    C, R, N, M = 8, 256, 64, 64
    a = (rng.integers(0, 8, (C, N)) * 4 + rng.integers(0, 2, (C, N))).astype(np.int32)
    al = rng.integers(1, N + 1, (C,)).astype(np.int32)
    b = (rng.integers(0, 8, (R, M)) * 4 + rng.integers(0, 2, (R, M))).astype(np.int32)
    bl = rng.integers(0, M + 1, (R,)).astype(np.int32)
    for i in range(C):
        a[i, al[i]:] = -2
    for i in range(R):
        b[i, bl[i]:] = -3
    args = [jnp.asarray(x) for x in (a, al, b, bl)]
    got = np.asarray(jax.jit(nw_best_scores_pallas)(*args))
    want = np.asarray(jax.jit(nw_best_scores)(*args))
    check("nw pallas == xla (device)", np.array_equal(got, want))

    # 2. seqalign Pallas (cross + pairwise) == XLA row kernel
    from gfalign_tpu.ops.seqalign import (_jitted_forward,
                                          _jitted_forward_pairs)
    from gfalign_tpu.ops.seqalign_pallas import (local_forward_pallas,
                                                 local_forward_pairs_pallas)

    reads = rng.integers(0, 6, size=(40, 120)).astype(np.int8)
    paths = rng.integers(0, 6, size=(5, 200)).astype(np.int8)
    paths[0, 10:110] = reads[0, :100] % 4
    reads[0, :100] = reads[0, :100] % 4
    got = local_forward_pallas(reads, paths)
    want = [np.asarray(x) for x in _jitted_forward()(reads, paths)]
    check("seqalign pallas cross == xla (device)",
          all(np.array_equal(g, w) for g, w in zip(got, want)))
    ppaths = rng.integers(0, 6, size=(40, 200)).astype(np.int8)
    got = local_forward_pairs_pallas(reads, ppaths)
    want = [np.asarray(x) for x in _jitted_forward_pairs()(reads, ppaths)]
    check("seqalign pallas pairwise == xla (device)",
          all(np.array_equal(g, w) for g, w in zip(got, want)))

    # 2b. banded arena kernel (the seeded align production path): Pallas ==
    # XLA scan over the same device-assembled strips, with overlap drops,
    # reverse orientations, ties, PADs, and off-band deltas in the mix
    import random as pyrandom

    from gfalign_tpu.engine.graph_align import (_DevicePools, build_oriented,
                                                overlap_table)
    from gfalign_tpu.graph.model import Graph, Link
    from gfalign_tpu.io.fastq import encode_seq
    from gfalign_tpu.ops.seqalign import _jitted_banded_arena
    from gfalign_tpu.ops.seqalign_pallas import banded_arena_scores_pallas

    prng = pyrandom.Random(23)
    g = Graph()
    for i, ln in enumerate([140, 155, 133, 164, 148, 137]):
        g.add_segment(f"m{i}", "".join(prng.choice("ACGT")
                                       for _ in range(ln)))
    for i, ov in enumerate(["3M", "0M", "5M", "0M", "2M"]):
        g.links.append(Link(i, "+", i + 1, "+", ov))
    lut = overlap_table(g)
    step_sets = [[(0, "+"), (1, "+"), (2, "+")],
                 [(1, "+"), (2, "+"), (3, "+"), (4, "+")],
                 [(5, "-"), (4, "-"), (3, "-")],
                 [(2, "+"), (3, "+"), (4, "+"), (5, "+")]]
    ops_b = [build_oriented(g, s, lut) for s in step_sets]
    smoke_reads = []
    for op in ops_b:
        codes = encode_seq(op.seq)
        seq = codes[20:148].copy()
        seq[5] = (seq[5] + 1) % 4
        smoke_reads.append(seq)
    pools = _DevicePools(smoke_reads, g)
    rows = [pools.path_idx(tuple(s), op)
            for s, op in zip(step_sets, ops_b)]
    pools.sync_paths()
    W, Np = 64, 256
    ridx = rng.integers(0, len(smoke_reads), size=Np).astype(np.int32)
    pidx = np.array([rows[int(i)]
                     for i in rng.integers(0, len(rows), size=Np)], np.int32)
    dl = rng.integers(-80, 400, size=Np).astype(np.int32)
    args = (pools.arena, pools.cum_off, pools.base_ptr, pools.plen,
            pools.reads, ridx, pidx, dl)
    got = [np.asarray(x) for x in banded_arena_scores_pallas(*args, W)]
    want = [np.asarray(x) for x in _jitted_banded_arena(W)(*args)]
    check("banded arena pallas == xla (device)",
          all(np.array_equal(gg, w) for gg, w in zip(got, want)))

    # 3. shard_map frontier step, Pallas vs XLA on a real-chip mesh
    from jax.sharding import Mesh

    from gfalign_tpu.parallel.score_step import sharded_scoring_step

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "cand"))
    with mesh:
        got = np.asarray(sharded_scoring_step(mesh, a, al, b, bl,
                                              use_pallas=True))
        want = np.asarray(sharded_scoring_step(mesh, a, al, b, bl,
                                               use_pallas=False))
    check("shard_map pallas tallies == xla (device mesh)",
          np.array_equal(got, want))

    # 4. CLI end-to-end on the device: align byte-equality + scored search
    if (REFERENCE / "testFiles").is_dir():
        import io

        from gfalign_tpu.cli.main import main as cli

        tf = str(REFERENCE / "testFiles")
        for name in ("random1", "random2"):
            buf = io.StringIO()
            old = sys.stdout
            sys.stdout = buf
            cli(["align", "-f", f"{tf}/{name}.gfa", "-r",
                 f"{tf}/{name}.reads.fq"])
            sys.stdout = old
            want_text = (REFERENCE / "testFiles" / f"{name}.gaf").read_text()
            check(f"align {name}.gaf byte-equal (device)",
                  buf.getvalue() == want_text)
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        cli(["search", "-f", f"{tf}/random3.gfa", "-g", f"{tf}/random3.gaf",
             "-n", f"{tf}/random3.search_nodelist.tsv", "-s", "1", "-d", "4"])
        sys.stdout = old
        lock = (ROOT / "tests" / "data" / "search_scored.out").read_text()
        check("scored search byte-equal to lock (device)",
              buf.getvalue() == lock)
    else:
        print("SKIP CLI checks (reference fixtures not mounted)")

    # AOT executable cache: a second process must DESERIALIZE the
    # compiled Pallas kernel (ops/aot_cache.py) instead of paying the
    # Mosaic compile again — the lever that makes
    # GFALIGN_TPU_ALIGN_DEVICE=1 viable for one-shot CLI runs on
    # remote-compile transports.
    import os
    import subprocess
    import sys as _sys
    import tempfile
    # The check asserts the MECHANISM (process 1 compiles + serializes;
    # process 2 deserializes, zero Mosaic recompiles) rather than a
    # wall-clock ratio: this box's tunnel re-does remote work on the
    # first dispatch of any executable and has multi-minute congestion
    # windows (measured: deserialize 0.03 s, first exec of the LOADED
    # executable 1.5-440 s depending on tunnel state), so timing is not
    # a stable signal here.  On a locally attached TPU the deserialized
    # executable runs immediately.
    script = (
        "import sys, time; sys.path.insert(0, {root!r}); import numpy as np;"
        "t0 = time.perf_counter();"
        "from gfalign_tpu.ops.seqalign_pallas import"
        " local_forward_pairs_pallas as f;"
        "from gfalign_tpu.ops import aot_cache;"
        "rng = np.random.default_rng(0);"
        "r = rng.integers(0, 4, (8, 64)).astype(np.int8);"
        "p = rng.integers(0, 4, (8, 96)).astype(np.int8);"
        "b, _, _ = f(r, p);"
        "print('WALL', time.perf_counter() - t0, int(b[0]),"
        " aot_cache.STATS['disk_hits'], aot_cache.STATS['compiles'])"
    ).format(root=str(ROOT))
    with tempfile.TemporaryDirectory() as aot_dir:
        env = {**os.environ, "GFALIGN_TPU_AOT_DIR": aot_dir}
        runs = []
        for _ in range(2):
            out = subprocess.run([_sys.executable, "-c", script], env=env,
                                 capture_output=True, text=True, timeout=900)
            walls = [ln for ln in out.stdout.splitlines()
                     if ln.startswith("WALL")]
            assert walls, out.stderr[-500:]
            # WALL <wall_s> <best0> <disk_hits> <compiles>
            parts = walls[-1].split()
            runs.append((float(parts[1]), int(parts[3]), int(parts[4])))
        (w1, h1, c1), (w2, h2, c2) = runs
        check(f"aot cache: p1 compiled ({c1} compiles, {w1:.0f}s), "
              f"p2 deserialized ({h2} disk hits, {c2} compiles, {w2:.0f}s)",
              c1 == 1 and h1 == 0 and h2 == 1 and c2 == 0)
    print("ALL TPU SMOKE CHECKS PASSED")


if __name__ == "__main__":
    main()
