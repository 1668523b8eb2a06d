"""Randomized GFA parse/write round-trip fuzz (both output dialects)."""

import io
import random

import pytest

from gfalign_tpu.io.gfa import parse_gfa_lines
from gfalign_tpu.io.writers import write_gfa1, write_gfa2


def random_gfa(rng):
    n = rng.randrange(1, 12)
    lines = ["H\tVN:Z:1.2"]
    names = [f"seg{i}" for i in range(n)]
    for nm in names:
        seq = "".join(rng.choice("ACGTacgtN") for _ in range(rng.randrange(1, 40)))
        lines.append(f"S\t{nm}\t{seq}" + ("\tRC:i:5" if rng.random() < 0.3 else ""))
    for _ in range(rng.randrange(0, 2 * n)):
        a, b = rng.choice(names), rng.choice(names)
        lines.append(f"L\t{a}\t{rng.choice('+-')}\t{b}\t{rng.choice('+-')}"
                     f"\t{rng.randrange(0, 9)}M")
    for _ in range(rng.randrange(0, 3)):
        a, b = rng.choice(names), rng.choice(names)
        lines.append(f"J\t{a}\t{rng.choice('+-')}\t{b}\t{rng.choice('+-')}"
                     f"\t{rng.randrange(0, 100)}")
    if rng.random() < 0.7 and n >= 2:
        steps = rng.sample(names, min(n, rng.randrange(2, 5)))
        seps = [rng.choice(",;") for _ in steps[:-1]]
        col3, col4 = "", []
        for i, s in enumerate(steps):
            if i:
                col3 += seps[i - 1]
                col4.append("5" if seps[i - 1] == ";" else "3M")
            col3 += s + rng.choice("+-")
        lines.append(f"P\tp0\t{col3}\t{','.join(col4) if col4 else '*'}")
    return lines


@pytest.mark.parametrize("seed", range(10))
def test_roundtrip(seed):
    rng = random.Random(seed * 31 + 7)
    g = parse_gfa_lines(random_gfa(rng))
    for writer in (write_gfa1, write_gfa2):
        buf = io.StringIO()
        writer(g, buf.write)
        rt = parse_gfa_lines(buf.getvalue().split("\n"))
        assert rt.segment_names() == g.segment_names()
        for sid in range(g.n_segments):
            assert rt.segment(sid).seq == g.segment(sid).seq
        assert [(e.s1, e.or1, e.s2, e.or2, e.overlap) for e in rt.links] == \
            [(e.s1, e.or1, e.s2, e.or2, e.overlap) for e in g.links]
        # GFA2 path-gap junctions need G records, so the writer may add
        # synthetic ones; count can only grow
        assert len(rt.gaps) >= len(g.gaps)
        assert len(rt.paths) == len(g.paths)
        for p1, p2 in zip(g.paths, rt.paths):
            assert p1.steps == p2.steps
            # sep KINDS always survive; GFA2 O lines can't carry per-junction
            # cigars inline, so edge overlap values recover only via E records
            assert [s[0] for s in p1.seps] == [s[0] for s in p2.seps]
            assert [s[1] for s in p1.seps if s[0] == "gap"] == \
                [s[1] for s in p2.seps if s[0] == "gap"]
