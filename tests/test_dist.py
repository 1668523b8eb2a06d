"""Distributed data-pipeline tests (simulated multi-host on one process)."""

import numpy as np
import pytest

import jax

from .conftest import REFERENCE

from gfalign_tpu.parallel.dist import allreduce_stats, shard_records

fixtures = pytest.mark.skipif(not (REFERENCE / "testFiles").is_dir(),
                              reason="reference fixtures not mounted")


def test_shard_records_partition():
    items = list(range(17))
    shards = [list(shard_records(items, i, 4)) for i in range(4)]
    assert sorted(sum(shards, [])) == items
    assert all(all(v % 4 == i for v in s) for i, s in enumerate(shards))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_allreduce_stats_identity_single_process():
    totals = [91, 37, 0, 12345678901234]
    assert allreduce_stats(totals) == totals


@fixtures
def test_sharded_load_totals_merge():
    """Two simulated hosts each load their record shard; merged totals must
    equal a full single-host load (the psum contract)."""
    from gfalign_tpu.engine.alignments import AlignmentSet

    path = str(REFERENCE / "testFiles" / "random2.gaf")
    full = AlignmentSet()
    full.load(path)
    attrs = ("tot_qlen", "tot_algseq", "tot_plus", "tot_minus", "tot_plen",
             "tot_mapq", "tot_matches", "tot_blocklen")
    merged = [0] * len(attrs)
    n_records = 0
    for host in range(2):
        part = AlignmentSet()
        part.load(path, shard=(host, 2))
        n_records += len(part.records)
        for i, a in enumerate(attrs):
            merged[i] += getattr(part, a)
    assert n_records == len(full.records)
    assert merged == [getattr(full, a) for a in attrs]


@fixtures
def test_real_two_process_allreduce(tmp_path):
    """Spawn two actual jax.distributed processes (Gloo over localhost);
    the qname-sharded loads psum-merge to the exact global totals."""
    import socket
    import subprocess
    import sys as _sys
    import pathlib
    import os

    repo = pathlib.Path(__file__).resolve().parent.parent
    worker = tmp_path / "worker.py"
    worker.write_text(f"""
import sys
sys.path.insert(0, {str(repo)!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
from gfalign_tpu.engine.alignments import AlignmentSet
a = AlignmentSet()
a.load({str(REFERENCE / 'testFiles' / 'random2.gaf')!r},
       shard=(pid, nproc), shard_by="qname")
a.merge_distributed()
if pid == 0:
    print(a._count_override, a.tot_qlen, a.tot_algseq, a.tot_plen, a.tot_mapq)
""")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    for attempt in range(3):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        procs = [subprocess.Popen([_sys.executable, str(worker), str(i), "2", port],
                                  stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                                  text=True, env=env)
                 for i in range(2)]
        outs = [p.communicate(timeout=120)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
    assert all(p.returncode == 0 for p in procs)
    from gfalign_tpu.engine.alignments import AlignmentSet

    full = AlignmentSet()
    full.load(str(REFERENCE / "testFiles" / "random2.gaf"))
    want = f"{full.count} {full.tot_qlen} {full.tot_algseq} {full.tot_plen} {full.tot_mapq}"
    assert outs[0].strip().splitlines()[-1] == want


@fixtures
def test_real_two_process_search(tmp_path):
    """Two real jax.distributed processes run the scored tangle search with
    qname-sharded reads; process 0's output must be byte-identical to a
    single-host run (per-frontier tallies psum-merge; the heap evolves
    identically everywhere)."""
    import os
    import socket
    import subprocess
    import sys as _sys
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    (tmp_path / "testFiles").symlink_to(REFERENCE / "testFiles")
    worker = tmp_path / "worker.py"
    worker.write_text(f"""
import sys, io, os
sys.path.insert(0, {str(repo)!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
os.environ["GFALIGN_TPU_DISTRIBUTED"] = "1"
os.chdir({str(tmp_path)!r})
from gfalign_tpu.cli.main import main
buf = io.StringIO(); old = sys.stdout; sys.stdout = buf
main(["search", "-f", "testFiles/random3.gfa", "-g", "testFiles/random3.gaf",
      "-n", "testFiles/random3.search_nodelist.tsv", "-s", "1", "-d", "4"])
sys.stdout = old
if pid == 0:
    print(buf.getvalue(), end="")
""")
    import pathlib as _pl
    expected = (_pl.Path(__file__).parent / "data" / "search_scored.out").read_text()
    errs = []
    for attempt in range(5):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        procs = [subprocess.Popen([_sys.executable, str(worker), str(i), "2", port],
                                  stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                                  text=True, env={**os.environ})
                 for i in range(2)]
        results = [p.communicate(timeout=180) for p in procs]
        got = "".join(l for l in results[0][0].splitlines(keepends=True)
                      if not l.startswith("[Gloo]"))
        if all(p.returncode == 0 for p in procs) and got == expected:
            return
        errs.append((attempt, [p.returncode for p in procs], got,
                     [r[1][-800:] for r in results]))
    raise AssertionError(f"two-process search failed 5 attempts: {errs}")


def _random_gaf_lines(rng, n_names=40, dup_frac=0.5):
    """GAF lines exercising duplicate runs, scratch leaks, and terminal
    windows; qnames sort-interleave so leaks cross qname-hash shards."""
    lines = []
    for k in range(n_names):
        name = f"q{k:03d}"
        copies = 1 if rng.random() > dup_frac else rng.randrange(2, 5)
        for _ in range(copies):
            qlen = rng.randrange(50, 800)
            qs = rng.randrange(0, qlen)
            qe = rng.randrange(qs, qlen + 1)
            plen = rng.randrange(100, 900)
            ps = rng.randrange(0, 520)
            pe = rng.randrange(ps, max(ps + 1, plen))
            lines.append(f"{name}\t{qlen}\t{qs}\t{qe}\t+\t>n1\t{plen}\t{ps}"
                         f"\t{pe}\t10\t12\t60")
    rng.shuffle(lines)
    return lines


def test_dup_stats_walk_matches_mark_duplicates():
    """The vectorized walk (_dup_stats_walk, the production core of
    mark_duplicates) matches the scalar reference transcription
    (_dup_stats_oracle), fuzzed over random duplicate/leak/terminal
    patterns — counters AND terminal pairs in emission order."""
    import random

    import numpy as np

    from gfalign_tpu.engine.alignments import (AlignmentSet, GafRecord,
                                               _dup_stats_oracle,
                                               _dup_stats_walk)

    rng = random.Random(31)
    for _ in range(20):
        lines = _random_gaf_lines(rng)
        a = AlignmentSet()
        a._records = []
        for pos, line in enumerate(lines):
            rec = GafRecord.from_line(line, pos)
            a._records.append(rec)
            a._accumulate(rec)
        a.sort_by_name()
        a.mark_duplicates()
        qnames = [a.qname_at(i) for i in range(a.count)]
        cols = np.array([[a.numeric_at(i, c) for c in (1, 2, 4, 5, 6)]
                         for i in range(a.count)], dtype=np.int64)
        walk = _dup_stats_walk(qnames, cols, collect_pairs=True)
        oracle = _dup_stats_oracle(qnames, cols, collect_pairs=True)
        assert walk == oracle
        assert walk[:4] == (a.primary, a.secondary, a.supplementary,
                            a.terminal_supplementary)


@pytest.mark.parametrize("nproc", [2, 4])
def test_real_two_process_exact_dup_marking(tmp_path, nproc):
    """Real jax.distributed processes (2 and 4), qname-hash sharding: the
    exact distributed duplicate marking must equal a single-host run
    INCLUDING the cross-host scratch-leak quirk (singletons adjacent in
    global name order leak into another host's duplicate group)."""
    import os
    import random
    import socket
    import subprocess
    import sys as _sys
    import pathlib

    import numpy as np

    from gfalign_tpu.engine.alignments import AlignmentSet

    rng = random.Random(77)
    gaf = tmp_path / "dup.gaf"
    gaf.write_text("\n".join(_random_gaf_lines(rng, n_names=60)) + "\n")

    truth = AlignmentSet()
    truth.load(str(gaf))
    truth.sort_by_name()
    truth.mark_duplicates()
    want = (f"{truth.primary} {truth.secondary} {truth.supplementary} "
            f"{truth.terminal_supplementary}")

    repo = pathlib.Path(__file__).resolve().parent.parent
    worker = tmp_path / "worker.py"
    worker.write_text(f"""
import sys
sys.path.insert(0, {str(repo)!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
from gfalign_tpu.engine.alignments import AlignmentSet
a = AlignmentSet()
a.load({str(gaf)!r}, shard=(pid, nproc), shard_by="qname")
a.sort_by_name()
a.mark_duplicates_distributed()
a.merge_distributed(dup_counts=False)
print(a.primary, a.secondary, a.supplementary, a.terminal_supplementary)
""")
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "GFALIGN_TPU_CACHE": ""}
    errs = []
    for attempt in range(5):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        procs = [subprocess.Popen([_sys.executable, str(worker), str(i),
                                   str(nproc), port],
                                  stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                                  text=True, env=env)
                 for i in range(nproc)]
        results = [p.communicate(timeout=240) for p in procs]
        got = [r[0].strip().splitlines()[-1] if r[0].strip() else "" for r in results]
        if all(p.returncode == 0 for p in procs) and all(g == want for g in got):
            return
        errs.append(([p.returncode for p in procs], got, want,
                     [r[1][-500:] for r in results]))
    raise AssertionError(f"exact dup marking failed 5 attempts: {errs}")


def test_real_two_process_terminal_pair_printing(tmp_path):
    """Distributed -t: terminal-supplementary pair LINES print identically
    to a single-host run — pair records are shipped from their owning
    hosts by one allgather after the metadata walk."""
    import os
    import random
    import socket
    import subprocess
    import sys as _sys
    import pathlib
    import io as _io

    from gfalign_tpu.engine.alignments import AlignmentSet

    rng = random.Random(5)
    lines = _random_gaf_lines(rng, n_names=30)
    # guaranteed terminal pairs (pEnd at path end, mate pStart at path head)
    for k in range(4):
        name = f"t{k:02d}"
        lines.append(f"{name}\t900\t0\t400\t+\t>n1\t1000\t700\t999\t10\t12\t60")
        lines.append(f"{name}\t900\t450\t900\t+\t>n2\t1000\t3\t450\t10\t12\t60")
    random.Random(9).shuffle(lines)
    gaf = tmp_path / "term.gaf"
    gaf.write_text("\n".join(lines) + "\n")

    truth = AlignmentSet()
    truth.load(str(gaf), terminal_flag=True)
    truth.sort_by_name()
    buf = _io.StringIO()
    truth.mark_duplicates(buf)
    want_pairs = buf.getvalue()
    assert truth.terminal_supplementary >= 3
    want = (f"{truth.primary} {truth.secondary} {truth.supplementary} "
            f"{truth.terminal_supplementary}")

    repo = pathlib.Path(__file__).resolve().parent.parent
    worker = tmp_path / "worker.py"
    worker.write_text(f"""
import sys, io
sys.path.insert(0, {str(repo)!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
from gfalign_tpu.engine.alignments import AlignmentSet
a = AlignmentSet()
a.load({str(gaf)!r}, terminal_flag=True, shard=(pid, nproc), shard_by="qname")
a.sort_by_name()
buf = io.StringIO()
a.mark_duplicates_distributed(buf)
a.merge_distributed(dup_counts=False)
sys.stdout.write(buf.getvalue())
print("COUNTS", a.primary, a.secondary, a.supplementary, a.terminal_supplementary)
""")
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "GFALIGN_TPU_CACHE": ""}
    errs = []
    for attempt in range(5):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        procs = [subprocess.Popen([_sys.executable, str(worker), str(i), "2", port],
                                  stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                                  text=True, env=env)
                 for i in range(2)]
        results = [p.communicate(timeout=120) for p in procs]
        # Gloo prints connection banners to stdout; drop them before the diff
        outs = ["".join(ln for ln in r[0].splitlines(keepends=True)
                        if not ln.startswith("[Gloo]")) for r in results]
        expected = want_pairs + "COUNTS " + want + "\n"
        if all(p.returncode == 0 for p in procs) and outs[0] == outs[1] == expected:
            return
        errs.append(([p.returncode for p in procs], outs, expected,
                     [r[1][-500:] for r in results]))
    raise AssertionError(f"terminal pair printing failed 5 attempts: {errs}")


@fixtures
def test_real_two_process_search_read_sharded(tmp_path):
    """Read-sharded distributed search through the native driver's
    ring-sum mode: two processes with disjoint read shards produce output
    byte-identical to the single-process run."""
    import os
    import socket
    import subprocess
    import sys as _sys
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    worker = tmp_path / "worker.py"
    worker.write_text(f"""
import sys, io
sys.path.insert(0, {str(repo)!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
from gfalign_tpu.engine.alignments import AlignmentSet
from gfalign_tpu.engine.evaluate import distributed_evaluator
from gfalign_tpu.engine.search import search
from gfalign_tpu.io.gfa import read_gfa
tf = {str(REFERENCE / 'testFiles')!r}
graph = read_gfa(tf + "/random3.gfa")
aln = AlignmentSet()
aln.load(tf + "/random3.gaf", shard=(pid, nproc), shard_by="qname")
buf = io.StringIO()
search(graph, aln, tf + "/random3.search_nodelist.tsv", "1", "4",
       out=buf, evaluate_fn=distributed_evaluator())
if pid == 0:
    print(buf.getvalue(), end="")
""")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    for attempt in range(5):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        procs = [subprocess.Popen(
            [_sys.executable, str(worker), str(i), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env) for i in range(2)]
        outs = [p.communicate(timeout=180) for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
    assert all(p.returncode == 0 for p in procs), [o[1][-500:] for o in outs]

    import io as _io

    from gfalign_tpu.engine.alignments import AlignmentSet
    from gfalign_tpu.engine.search import search
    from gfalign_tpu.io.gfa import read_gfa

    graph = read_gfa(str(REFERENCE / "testFiles" / "random3.gfa"))
    aln = AlignmentSet()
    aln.load(str(REFERENCE / "testFiles" / "random3.gaf"))
    want = _io.StringIO()
    search(graph, aln, str(REFERENCE / "testFiles" /
                           "random3.search_nodelist.tsv"), "1", "4",
           out=want)
    assert outs[0][0] == want.getvalue()


@pytest.mark.parametrize("nproc", [2, 3])
def test_real_two_process_align(tmp_path, nproc):
    """Distributed align mode: real jax.distributed processes (2, and 3
    for uneven round-robin shards) align read-index shards; rank 0's
    gathered GAF must be byte-identical to the single-process run (reads
    are independent — the gather reassembles exact input order)."""
    import os
    import socket
    import subprocess
    import sys as _sys
    import pathlib

    from gfalign_tpu.synth import make_workload, write_workload

    wl = make_workload(seed=11, n_segments=100, n_reads=24,
                       seg_len=(150, 400), read_len=(400, 1200))
    paths = write_workload(wl, str(tmp_path / "wl"))

    # single-process reference run (in-process; conftest pins CPU)
    from gfalign_tpu.cli.main import main as _main

    single = tmp_path / "single.gaf"
    _main(["align", "-f", paths["gfa"], "-r", paths["reads"],
           "-o", str(single)])

    repo = pathlib.Path(__file__).resolve().parent.parent
    out2 = tmp_path / "dist.gaf"
    worker = tmp_path / "worker.py"
    worker.write_text(f"""
import sys, os
sys.path.insert(0, {str(repo)!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
os.environ["GFALIGN_TPU_DISTRIBUTED"] = "1"
from gfalign_tpu.cli.main import main
main(["align", "-f", {paths["gfa"]!r}, "-r", {paths["reads"]!r},
      "-o", {str(out2)!r}])
""")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    for attempt in range(5):
        if out2.exists():
            out2.unlink()
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        procs = [subprocess.Popen(
            [_sys.executable, str(worker), str(i), str(nproc), port],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env) for i in range(nproc)]
        outs = [p.communicate(timeout=300) for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
    assert all(p.returncode == 0 for p in procs), [o[1][-800:] for o in outs]
    assert out2.read_bytes() == single.read_bytes()


@fixtures
@pytest.mark.parametrize("nproc,mode", [(4, "frontier"), (4, "read"),
                                        (8, "frontier"), (8, "read")])
def test_real_multiproc_search_parity(tmp_path, nproc, mode):
    """Scaled distributed-correctness: the full scored tangle search at 4
    and 8 real jax.distributed processes, in BOTH sharding modes
    (frontier-sharded with replicated reads; read-sharded through the
    native driver's ring-sum).  Output must stay byte-identical to the
    single-process run — validates the KV/shm transports and the
    replicated commit loop beyond the 2-process tests."""
    import os
    import socket
    import subprocess
    import sys as _sys
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    worker = tmp_path / "worker.py"
    worker.write_text(f"""
import sys, io
sys.path.insert(0, {str(repo)!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port, mode = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                          sys.argv[4])
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
from gfalign_tpu.engine.alignments import AlignmentSet
from gfalign_tpu.engine.evaluate import (distributed_evaluator,
                                         frontier_sharded_evaluator)
from gfalign_tpu.engine.search import search
from gfalign_tpu.io.gfa import read_gfa
tf = {str(REFERENCE / 'testFiles')!r}
graph = read_gfa(tf + "/random3.gfa")
aln = AlignmentSet()
if mode == "frontier":
    aln.load(tf + "/random3.gaf")
    evaluate_fn = frontier_sharded_evaluator()
else:
    aln.load(tf + "/random3.gaf", shard=(pid, nproc), shard_by="qname")
    evaluate_fn = distributed_evaluator()
buf = io.StringIO()
search(graph, aln, tf + "/random3.search_nodelist.tsv", "1", "4",
       out=buf, evaluate_fn=evaluate_fn)
if pid == 0:
    print(buf.getvalue(), end="")
""")
    import io as _io

    from gfalign_tpu.engine.alignments import AlignmentSet
    from gfalign_tpu.engine.search import search
    from gfalign_tpu.io.gfa import read_gfa

    graph = read_gfa(str(REFERENCE / "testFiles" / "random3.gfa"))
    aln = AlignmentSet()
    aln.load(str(REFERENCE / "testFiles" / "random3.gaf"))
    want = _io.StringIO()
    search(graph, aln, str(REFERENCE / "testFiles" /
                           "random3.search_nodelist.tsv"), "1", "4",
           out=want)

    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    errs = []
    for attempt in range(3):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        procs = [subprocess.Popen(
            [_sys.executable, str(worker), str(i), str(nproc), port, mode],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env) for i in range(nproc)]
        outs = [p.communicate(timeout=600) for p in procs]
        got = "".join(ln for ln in outs[0][0].splitlines(keepends=True)
                      if not ln.startswith("[Gloo]"))
        if all(p.returncode == 0 for p in procs) and got == want.getvalue():
            return
        errs.append((attempt, [p.returncode for p in procs],
                     [o[1][-400:] for o in outs]))
    raise AssertionError(f"{nproc}-process {mode} search parity: {errs}")


def test_real_distributed_align_more_ranks_than_reads(tmp_path):
    """Edge: 3 processes, 2 reads — one rank's shard is empty; the gather
    must still reassemble byte-identically (empty length-prefixed
    payloads are valid)."""
    import os
    import socket
    import subprocess
    import sys as _sys
    import pathlib

    from gfalign_tpu.synth import make_workload, write_workload

    wl = make_workload(seed=13, n_segments=100, n_reads=2,
                      seg_len=(150, 400), read_len=(400, 900))
    paths = write_workload(wl, str(tmp_path / "wl"))
    from gfalign_tpu.cli.main import main as _main

    single = tmp_path / "single.gaf"
    _main(["align", "-f", paths["gfa"], "-r", paths["reads"],
           "-o", str(single)])
    repo = pathlib.Path(__file__).resolve().parent.parent
    out2 = tmp_path / "dist.gaf"
    worker = tmp_path / "worker.py"
    worker.write_text(f"""
import sys, os
sys.path.insert(0, {str(repo)!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
os.environ["GFALIGN_TPU_DISTRIBUTED"] = "1"
from gfalign_tpu.cli.main import main
main(["align", "-f", {paths["gfa"]!r}, "-r", {paths["reads"]!r},
      "-o", {str(out2)!r}])
""")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    for attempt in range(5):
        if out2.exists():
            out2.unlink()
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        procs = [subprocess.Popen(
            [_sys.executable, str(worker), str(i), "3", port],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env) for i in range(3)]
        outs = [p.communicate(timeout=300) for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
    assert all(p.returncode == 0 for p in procs), [o[1][-600:] for o in outs]
    assert out2.read_bytes() == single.read_bytes()


def test_ring_sum_mode_high_out_degree_chunks(tmp_path):
    """Regression for the sum-mode ring fix: a pop whose out-degree
    (6000) exceeds one ring slot's tally capacity (~5461) must chunk the
    exchange across ring batches — the old truncation left immediate
    expansions unscored (zero-initialized tallies).  Two read-sharded
    processes must stay byte-identical to the single-process run."""
    import os
    import socket
    import subprocess
    import sys as _sys
    import pathlib

    n_mid = 6000
    gfa = tmp_path / "star.gfa"
    with open(gfa, "w") as fh:
        fh.write("S\ts\tACGTACGT\n")
        fh.write("S\td\tACGTACGT\n")
        for i in range(n_mid):
            fh.write(f"S\tm{i}\tACGT\n")
        for i in range(n_mid):
            fh.write(f"L\ts\t+\tm{i}\t+\t0M\n")
            fh.write(f"L\tm{i}\t+\td\t+\t0M\n")
    nodelist = tmp_path / "nodes.tsv"
    with open(nodelist, "w") as fh:
        fh.write("s\t1\nd\t1\n")
        for i in range(n_mid):
            fh.write(f"m{i}\t1\n")
    gaf = tmp_path / "reads.gaf"
    with open(gaf, "w") as fh:
        for k in range(6):
            mid = f"m{k * 7}"
            fh.write(f"q{k}\t16\t0\t16\t+\t>s>{mid}>d\t16\t0\t16\t16\t16\t"
                     f"60\n")

    import io as _io

    from gfalign_tpu.engine.alignments import AlignmentSet
    from gfalign_tpu.engine.search import search
    from gfalign_tpu.io.gfa import read_gfa

    graph = read_gfa(str(gfa))
    aln = AlignmentSet()
    aln.load(str(gaf))
    want = _io.StringIO()
    search(graph, aln, str(nodelist), "s", "d", max_steps=50, out=want)
    assert want.getvalue().strip(), "single-process search found no paths"

    repo = pathlib.Path(__file__).resolve().parent.parent
    worker = tmp_path / "worker.py"
    worker.write_text(f"""
import sys, io
sys.path.insert(0, {str(repo)!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
from gfalign_tpu.engine.alignments import AlignmentSet
from gfalign_tpu.engine.evaluate import distributed_evaluator
from gfalign_tpu.engine.search import search
from gfalign_tpu.io.gfa import read_gfa
graph = read_gfa({str(gfa)!r})
aln = AlignmentSet()
aln.load({str(gaf)!r}, shard=(pid, nproc), shard_by="qname")
buf = io.StringIO()
search(graph, aln, {str(nodelist)!r}, "s", "d", max_steps=50,
       out=buf, evaluate_fn=distributed_evaluator())
if pid == 0:
    print(buf.getvalue(), end="")
""")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    errs = []
    for attempt in range(3):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        procs = [subprocess.Popen(
            [_sys.executable, str(worker), str(i), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env) for i in range(2)]
        outs = [p.communicate(timeout=300) for p in procs]
        got = "".join(ln for ln in outs[0][0].splitlines(keepends=True)
                      if not ln.startswith("[Gloo]"))
        if all(p.returncode == 0 for p in procs) and got == want.getvalue():
            return
        errs.append(([p.returncode for p in procs], got[:200],
                     [o[1][-300:] for o in outs]))
    raise AssertionError(f"high-out-degree ring-sum parity: {errs}")


def test_shm_exchange_ignores_stale_file(tmp_path):
    """Regression for the O_TRUNC fix: a stale /dev/shm parity buffer left
    by a crashed run with the same coordinator tag is zero-filled on
    rank-0 create — its poisoned seq cells must never satisfy a wait and
    merge dead data."""
    import os
    import socket
    import subprocess
    import sys as _sys
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    addr = f"127.0.0.1:{port}"
    tag = "".join(ch if ch.isalnum() else "_" for ch in addr)
    stale = pathlib.Path(f"/dev/shm/gfalign_ar_{tag}")
    # poison: huge seq counters + garbage data everywhere
    stale.write_bytes(b"\x7f" * (8 + 2 * 2 * (2 + 4096) * 8))
    try:
        worker = tmp_path / "worker.py"
        worker.write_text(f"""
import sys
sys.path.insert(0, {str(repo)!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
from gfalign_tpu.parallel.dist import allreduce_stats
for rep in range(3):
    got = allreduce_stats([10 + pid, 100 * (pid + 1)])
    assert got == [21, 300], got
print("OK")
""")
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        errs = []
        for attempt in range(3):
            stale.write_bytes(b"\x7f" * (8 + 2 * 2 * (2 + 4096) * 8))
            procs = [subprocess.Popen(
                [_sys.executable, str(worker), str(i), "2", port],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=env) for i in range(2)]
            outs = [p.communicate(timeout=180) for p in procs]
            if (all(p.returncode == 0 for p in procs)
                    and all("OK" in o[0] for o in outs)):
                return
            errs.append(([p.returncode for p in procs],
                         [o[1][-300:] for o in outs]))
            # pick a fresh port for the retry (the old one may linger)
            with socket.socket() as s:
                s.bind(("127.0.0.1", 0))
                port = str(s.getsockname()[1])
            addr = f"127.0.0.1:{port}"
            tag = "".join(ch if ch.isalnum() else "_" for ch in addr)
            stale = pathlib.Path(f"/dev/shm/gfalign_ar_{tag}")
        raise AssertionError(f"stale-shm allreduce: {errs}")
    finally:
        if stale.exists():
            stale.unlink()
