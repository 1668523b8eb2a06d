"""Regression locks for modes the reference goldens do NOT cover: scored
search, evalPath, GFA decoration, subgraph.  The expected outputs in
tests/data/ were hand-verified against the reference's algorithm semantics
(see git history); these tests freeze them against drift."""

import io
import os
import pathlib
import sys

import pytest

from .conftest import REFERENCE

DATA = pathlib.Path(__file__).resolve().parent / "data"

pytestmark = pytest.mark.skipif(not (REFERENCE / "testFiles").is_dir(),
                                reason="reference fixtures not mounted")

CASES = [
    ("search_scored.out",
     ["search", "-f", "testFiles/random3.gfa", "-g", "testFiles/random3.gaf",
      "-n", "testFiles/random3.search_nodelist.tsv", "-s", "1", "-d", "4"]),
    ("search_scored_all.out",
     ["search", "-f", "testFiles/random3.gfa", "-g", "testFiles/random3.gaf",
      "-n", "testFiles/random3.search_nodelist.tsv", "-s", "1", "-d", "4",
      "--return-all-paths"]),
    ("evalpath.out",
     ["evalPath", "-f", "testFiles/random3.gfa", "-g", "testFiles/random3.gaf",
      "-p", "1+,2+,3+,4+"]),
    ("evalpath_random2.out",
     ["evalPath", "-f", "testFiles/random2.gfa", "-g", "testFiles/random2.gaf",
      "-p", "11+,12-,13+"]),
    ("subgraph.out",
     ["subgraph", "-f", "testFiles/random3.gfa",
      "-n", "testFiles/random3.filter_nodelist.ls", "-o", "gfa"]),
]


@pytest.mark.parametrize("expected_file,argv", CASES, ids=[c[0] for c in CASES])
def test_locked_output(expected_file, argv, tmp_path):
    from gfalign_tpu.cli.main import main

    (tmp_path / "testFiles").symlink_to(REFERENCE / "testFiles")
    old_cwd, old_stdout = os.getcwd(), sys.stdout
    buf = io.StringIO()
    try:
        os.chdir(tmp_path)
        sys.stdout = buf
        main(argv)
    finally:
        os.chdir(old_cwd)
        sys.stdout = old_stdout
    assert buf.getvalue() == (DATA / expected_file).read_text()


def test_locked_decorated_gfa(tmp_path):
    from gfalign_tpu.cli.main import main

    (tmp_path / "testFiles").symlink_to(REFERENCE / "testFiles")
    old_cwd, old_stdout = os.getcwd(), sys.stdout
    try:
        os.chdir(tmp_path)
        sys.stdout = io.StringIO()
        main(["evalGFA", "-f", "testFiles/random2.gfa",
              "-g", "testFiles/random2.gaf", "-o", "out.gfa"])
    finally:
        os.chdir(old_cwd)
        sys.stdout = old_stdout
    assert (tmp_path / "out.gfa").read_text() == (DATA / "decorated.gfa").read_text()


def test_decorate_preserves_input_bytes(tmp_path):
    """Input-preserving decoration: output differs from the source GFA only
    by the appended RC:i tag on each L line (likeliest gfalibs writer match,
    reference decorate path src/input-gfalign.cpp:96)."""
    from gfalign_tpu.cli.main import main

    (tmp_path / "testFiles").symlink_to(REFERENCE / "testFiles")
    old_cwd, old_stdout = os.getcwd(), sys.stdout
    try:
        os.chdir(tmp_path)
        sys.stdout = io.StringIO()
        main(["evalGFA", "-f", "testFiles/random2.gfa",
              "-g", "testFiles/random2.gaf", "-o", "out.gfa"])
    finally:
        os.chdir(old_cwd)
        sys.stdout = old_stdout
    src = (REFERENCE / "testFiles" / "random2.gfa").read_text().splitlines()
    got = (tmp_path / "out.gfa").read_text().splitlines()
    assert len(src) == len(got)
    for s, g in zip(src, got):
        if s.startswith("L\t"):
            assert g.startswith(s + "\tRC:i:")
        else:
            assert g == s
