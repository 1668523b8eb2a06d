"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax

from gfalign_tpu.ops.nw_path import Step, batched_best_scores, nw_best_scores
from gfalign_tpu.parallel.mesh import default_mesh_shape, make_mesh
from gfalign_tpu.parallel.score_step import pad_for_mesh, sharded_scoring_step


def test_default_mesh_shape():
    assert default_mesh_shape(8) == (4, 2) or default_mesh_shape(8)[0] * default_mesh_shape(8)[1] == 8
    assert default_mesh_shape(1) == (1, 1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    rng = np.random.default_rng(0)
    C, n, R, m = 4, 8, 16, 8
    a_keys = (rng.integers(0, 6, (C, n)) * 4 + rng.integers(0, 2, (C, n))).astype(np.int32)
    a_len = rng.integers(2, n + 1, (C,)).astype(np.int32)
    for c in range(C):
        a_keys[c, a_len[c]:] = -1
    b_keys = (rng.integers(0, 6, (R, m)) * 4 + rng.integers(0, 2, (R, m))).astype(np.int32)
    b_len = rng.integers(1, m + 1, (R,)).astype(np.int32)
    for r in range(R):
        b_keys[r, b_len[r]:] = -2

    mesh = make_mesh(8)
    out = np.asarray(sharded_scoring_step(mesh, a_keys, a_len, b_keys, b_len))

    # single-device truth
    scores = np.asarray(nw_best_scores(a_keys, a_len, b_keys, b_len))
    a_ids = np.where(a_keys >= 0, a_keys // 4, -1)
    b_ids = np.where(b_keys >= 0, b_keys // 4, -2)
    for c in range(C):
        ids = set(a_ids[c, :a_len[c]].tolist())
        bad = good = unaligned = 0
        for r in range(R):
            off = sum(1 for j in range(b_len[r]) if b_ids[r, j] not in ids)
            if off:
                unaligned += off
                continue
            if scores[c, r] < 0:
                bad += 1
            else:
                good += 1
        assert out[c].tolist() == [bad, good, unaligned]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[0].shape[0], args[2].shape[0])


def test_pad_for_mesh():
    arr = np.zeros((5, 3), np.int32)
    lens = np.ones((5,), np.int32)
    arr2, lens2 = pad_for_mesh(arr, lens, 4, -2)
    assert arr2.shape[0] == 8 and (arr2[5:] == -2).all() and (lens2[5:] == 0).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_realistic_shape_memory():
    """Frontier scoring at realistic shapes (C=64, R=8192, m=n=64) must
    compile with bounded per-device temp memory: the membership test is a
    per-candidate binary search (O(C*R*m*log n) work, (Cl,Rl,m) memory),
    not the naive (Cl,Rl,m,n) broadcast-compare whose materialization is
    ~2 GB/shard and whose avoidance would otherwise be at the mercy of
    backend fusion choices.  Reference filter semantics: src/eval.cpp:81-91."""
    import functools

    from gfalign_tpu.parallel.score_step import sharded_scoring_step

    mesh = make_mesh(8)
    C, n, R, m = 64, 64, 8192, 64
    rng = np.random.default_rng(0)
    a_keys = (rng.integers(0, 900, (C, n)) * 4
              + rng.integers(0, 2, (C, n))).astype(np.int32)
    a_len = np.full((C,), n, np.int32)
    b_keys = (rng.integers(0, 900, (R, m)) * 4
              + rng.integers(0, 2, (R, m))).astype(np.int32)
    b_len = np.full((R,), m, np.int32)
    f = jax.jit(functools.partial(sharded_scoring_step, mesh))
    comp = f.lower(a_keys, a_len, b_keys, b_len).compile()
    ma = comp.memory_analysis()
    assert ma.temp_size_in_bytes < 512 * 1024 * 1024
