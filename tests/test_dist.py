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
