"""Golden-output regression harness.

Runs the reference's validateFiles/*.tst command lines verbatim against our
CLI and byte-diffs stdout — the same mechanism as the reference's
gfalign-validate binary (src/validate.cpp): line 1 = command, line 2 =
'embedded' (or an expected-output filename), remaining lines = expected
stdout.
"""

import io
import os
import pathlib
import shlex
import subprocess
import sys

import pytest

from .conftest import REFERENCE

VALIDATE_DIR = REFERENCE / "validateFiles"

tst_files = sorted(VALIDATE_DIR.glob("*.tst")) if VALIDATE_DIR.is_dir() else []


def load_tst(path: pathlib.Path):
    lines = path.read_text().split("\n")
    command = lines[0]
    assert lines[1] == "embedded", f"non-embedded expectation in {path}"
    expected = "\n".join(lines[2:])
    if expected.endswith("\n"):
        pass
    return command, expected


def run_cli(argv, cwd):
    """Run our CLI in-process with stdout captured."""
    from gfalign_tpu.cli.main import main

    old_cwd = os.getcwd()
    old_stdout = sys.stdout
    old_argv = sys.argv
    buf = io.StringIO()
    try:
        os.chdir(cwd)
        sys.stdout = buf
        sys.argv = ["gfalign"] + argv
        code = main(argv)
    finally:
        os.chdir(old_cwd)
        sys.stdout = old_stdout
        sys.argv = old_argv
    return code, buf.getvalue()


@pytest.fixture()
def workdir(tmp_path):
    (tmp_path / "testFiles").symlink_to(REFERENCE / "testFiles")
    return tmp_path


@pytest.mark.skipif(not tst_files, reason="reference validateFiles not mounted")
@pytest.mark.parametrize("tst", tst_files, ids=[t.stem for t in tst_files])
def test_golden(tst, workdir):
    command, expected = load_tst(tst)
    argv = shlex.split(command)
    assert argv[0] == "gfalign"
    code, out = run_cli(argv[1:], workdir)
    assert code == 0
    # the .tst embeds stdout including its trailing newline handling:
    # compare line lists like the reference harness (line diff)
    assert out.split("\n") == expected.split("\n"), (
        f"stdout mismatch for {tst.name}\n--- got ---\n{out}\n--- want ---\n{expected}")


@pytest.mark.skipif(not tst_files, reason="reference validateFiles not mounted")
def test_golden_subprocess(workdir):
    """One end-to-end smoke test through a real process boundary."""
    command, expected = load_tst(tst_files[0])
    argv = shlex.split(command)
    result = subprocess.run(
        [sys.executable, "-m", "gfalign_tpu"] + argv[1:],
        cwd=workdir, capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": str(pathlib.Path(__file__).resolve().parent.parent)},
    )
    assert result.returncode == 0, result.stderr
    assert result.stdout.split("\n") == expected.split("\n")


@pytest.mark.skipif(not tst_files, reason="reference validateFiles not mounted")
def test_filter_writes_literal_gaf_file(workdir):
    """`filter -o gaf` writes a literal file named 'gaf' (the gfalibs
    OutputStream does not know the gaf extension) containing the 3 kept
    records — the stray `gaf` file at the reference repo root is exactly
    this artifact."""
    run_cli(["filter", "-g", "testFiles/random3.gaf",
             "-n", "testFiles/random3.filter_nodelist.ls", "-o", "gaf"], workdir)
    gaf = (workdir / "gaf").read_text()
    assert len(gaf.strip().split("\n")) == 3
    reference_gaf = (REFERENCE / "gaf")
    if reference_gaf.is_file():
        assert gaf == reference_gaf.read_text()


def test_standalone_validator(tmp_path):
    """gfalign-validate (the reference's C18 harness equivalent) passes the
    reference suite and fails a corrupted expectation."""
    from gfalign_tpu.cli import validate

    assert validate.main([str(VALIDATE_DIR)]) == 0
    bad = tmp_path / "validateFiles"
    bad.mkdir()
    (tmp_path / "testFiles").symlink_to(REFERENCE / "testFiles")
    src = (VALIDATE_DIR / "test.0.tst").read_text()
    (bad / "corrupt.tst").write_text(src.replace("# alignments: 4",
                                                 "# alignments: 5"))
    assert validate.main([str(bad)]) == 1


def test_generate_tests_reproduces_reference_tst(tmp_path):
    """tools/generate_tests.py (reference gfalign-generate-tests equivalent,
    src/generate-tests.cpp) regenerates all eight .tst files byte-equal to
    the reference's committed validateFiles/."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "generate_tests",
        pathlib.Path(__file__).resolve().parent.parent / "tools" / "generate_tests.py")
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)

    out = tmp_path / "validateFiles"
    written = gen.generate(str(REFERENCE / "testFiles"), str(out))
    assert len(written) == 8
    for i in range(8):
        ours = (out / f"test.{i}.tst").read_text()
        theirs = (REFERENCE / "validateFiles" / f"test.{i}.tst").read_text()
        assert ours == theirs, f"test.{i}.tst differs"
