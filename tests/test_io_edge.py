"""Input-stream edge cases: gzip files and '-' stdin pipes."""

import gzip
import os
import pathlib
import subprocess
import sys

import pytest

from .conftest import REFERENCE

fixtures = pytest.mark.skipif(not (REFERENCE / "testFiles").is_dir(),
                              reason="reference fixtures not mounted")

REPO = pathlib.Path(__file__).resolve().parent.parent


@fixtures
def test_gzipped_gaf(tmp_path):
    from gfalign_tpu.engine.alignments import AlignmentSet

    src = (REFERENCE / "testFiles" / "random2.gaf").read_bytes()
    gz = tmp_path / "random2.gaf.gz"
    gz.write_bytes(gzip.compress(src))
    plain = AlignmentSet()
    plain.load(str(REFERENCE / "testFiles" / "random2.gaf"))
    zipped = AlignmentSet()
    zipped.load(str(gz))
    assert zipped.count == plain.count
    assert [zipped.line_at(i) for i in range(zipped.count)] == \
        [plain.line_at(i) for i in range(plain.count)]
    assert zipped.tot_qlen == plain.tot_qlen


@fixtures
def test_gzipped_gfa(tmp_path):
    from gfalign_tpu.io.gfa import read_gfa

    src = (REFERENCE / "testFiles" / "random2.gfa").read_bytes()
    gz = tmp_path / "random2.gfa.gz"
    gz.write_bytes(gzip.compress(src))
    a = read_gfa(str(REFERENCE / "testFiles" / "random2.gfa"))
    b = read_gfa(str(gz))
    assert a.segment_names() == b.segment_names()
    assert len(a.links) == len(b.links)


@fixtures
def test_stdin_pipe_gaf(tmp_path):
    """`-g -` reads GAF from stdin (reference pipeType behavior,
    src/main.cpp:145-149)."""
    (tmp_path / "testFiles").symlink_to(REFERENCE / "testFiles")
    gaf = (REFERENCE / "testFiles" / "random1.gaf").read_text()
    result = subprocess.run(
        [sys.executable, "-m", "gfalign_tpu", "evalGFA",
         "-f", "testFiles/random1.gfa", "-g", "-"],
        input=gaf, cwd=tmp_path, capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": f"{REPO}:{os.environ.get('PYTHONPATH', '')}"},
    )
    assert result.returncode == 0, result.stderr
    expected = "\n".join(
        (REFERENCE / "validateFiles" / "test.0.tst").read_text().split("\n")[2:])
    assert result.stdout.split("\n") == expected.split("\n")
