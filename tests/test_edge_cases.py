"""Edge-case robustness: unusual GFA/GAF shapes and CLI flag behaviors."""

import io
import os
import sys

import pytest

from .conftest import REFERENCE

from gfalign_tpu.engine.alignments import AlignmentSet
from gfalign_tpu.io.gfa import parse_gfa_lines

fixtures = pytest.mark.skipif(not (REFERENCE / "testFiles").is_dir(),
                              reason="reference fixtures not mounted")


def test_gfa_star_sequence_with_ln_tag():
    g = parse_gfa_lines(["S\tx\t*\tLN:i:1234", "S\ty\tACGT"])
    assert g.segment(g.name_to_id["x"]).length == 1234
    assert g.segment(g.name_to_id["x"]).seq == ""
    assert g.segment(g.name_to_id["y"]).length == 4


def test_gfa_forward_referenced_segment():
    # L line mentions 'b' before its S line; uids must stay consistent
    g = parse_gfa_lines(["S\ta\tAAAA", "L\ta\t+\tb\t+\t0M", "S\tb\tCCCC"])
    assert g.segment(g.name_to_id["b"]).seq == "CCCC"
    e = g.links[0]
    assert (g.segment(e.s1).name, g.segment(e.s2).name) == ("a", "b")


def test_empty_gaf(tmp_path):
    p = tmp_path / "empty.gaf"
    p.write_text("")
    a = AlignmentSet()
    a.load(str(p))
    assert a.count == 0
    buf = io.StringIO()
    a.print_stats(buf)
    assert "# alignments: 0" in buf.getvalue()
    assert "nan" in buf.getvalue()  # 0/0 averages print nan like the reference


def test_gaf_record_without_tags(tmp_path):
    p = tmp_path / "x.gaf"
    line = "r\t10\t0\t10\t+\t>n\t10\t0\t10\t10\t10\t60"
    p.write_text(line + "\n")
    a = AlignmentSet()
    a.load(str(p))
    assert a.line_at(0) == line + "\n"


@fixtures
def test_search_max_steps_cap(tmp_path):
    """`-m` cap prints the reference's 'Reached maximum number of steps'
    line (src/eval.cpp:190-191)."""
    from gfalign_tpu.cli.main import main

    (tmp_path / "testFiles").symlink_to(REFERENCE / "testFiles")
    old_cwd, old_stdout = os.getcwd(), sys.stdout
    buf = io.StringIO()
    try:
        os.chdir(tmp_path)
        sys.stdout = buf
        main(["search", "-f", "testFiles/random3.gfa",
              "-n", "testFiles/random3.search_nodelist.tsv",
              "-s", "1", "-d", "4", "-m", "2"])
    finally:
        os.chdir(old_cwd)
        sys.stdout = old_stdout
    assert "Reached maximum number of steps (2)" in buf.getvalue()


@fixtures
def test_search_min_nodes_filters_reports(tmp_path):
    from gfalign_tpu.cli.main import main

    (tmp_path / "testFiles").symlink_to(REFERENCE / "testFiles")
    old_cwd, old_stdout = os.getcwd(), sys.stdout
    buf = io.StringIO()
    try:
        os.chdir(tmp_path)
        sys.stdout = buf
        main(["search", "-f", "testFiles/random3.gfa",
              "-n", "testFiles/random3.search_nodelist.tsv",
              "-s", "1", "-d", "4", "--min-nodes", "4"])
    finally:
        os.chdir(old_cwd)
        sys.stdout = old_stdout
    rows = [r for r in buf.getvalue().splitlines() if r]
    assert len(rows) == 1 and rows[0].endswith("1+,2+,3+,4+")


@fixtures
def test_cmd_flag_echoes_argv(tmp_path):
    from gfalign_tpu.cli.main import main

    (tmp_path / "testFiles").symlink_to(REFERENCE / "testFiles")
    old_cwd, old_stdout = os.getcwd(), sys.stdout
    buf = io.StringIO()
    try:
        os.chdir(tmp_path)
        sys.stdout = buf
        main(["evalGFA", "-g", "testFiles/random1.gaf", "--cmd"])
    finally:
        os.chdir(old_cwd)
        sys.stdout = old_stdout
    assert buf.getvalue().startswith("gfalign ")


def test_preset_missing_arg_falls_back_to_clr():
    # reference align-mode quirk: `-p` with no argument selects the CLR
    # parameter set instead of erroring (src/main.cpp:155-160)
    from gfalign_tpu.cli.main import parse_args

    ui = parse_args(["align", "-p"])
    assert ui.preset == "CLR"


def test_threads_flag_reaches_native_parser(tmp_path, monkeypatch):
    # -j/--threads sizes the parse workers (reference threadPool.init,
    # src/main.cpp:658) instead of being silently ignored
    from gfalign_tpu.cli import main as climain
    from gfalign_tpu.io import native

    calls = []
    monkeypatch.setattr(native, "set_threads", lambda n: calls.append(n))
    gaf = tmp_path / "a.gaf"
    gaf.write_text("r1\t10\t0\t10\t+\t>s1\t10\t0\t10\t10\t10\t60\n")
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    climain.main(["evalGFA", "-g", str(gaf), "-j", "2"])
    assert calls == [2]


def test_cmd_echo_uses_argv0_as_typed(tmp_path, monkeypatch):
    # reference --cmd echoes argv[0] verbatim (src/main.cpp:651-656)
    from gfalign_tpu.cli import main as climain

    gaf = tmp_path / "a.gaf"
    gaf.write_text("r1\t10\t0\t10\t+\t>s1\t10\t0\t10\t10\t10\t60\n")
    monkeypatch.setattr(sys, "argv",
                        ["./build/bin/gfalign", "evalGFA", "-g", str(gaf), "--cmd"])
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    climain.main()
    first = buf.getvalue().splitlines()[0]
    assert first == f"./build/bin/gfalign evalGFA -g {gaf} --cmd "


def test_evalgfa_decorate_without_graph(tmp_path, monkeypatch):
    # reference runs evalGFA + writeToStream on the empty graph when -o is
    # given without -f (src/input-gfalign.cpp:93-97); must not error out
    from gfalign_tpu.cli import main as climain

    gaf = tmp_path / "a.gaf"
    gaf.write_text("r1\t10\t0\t10\t+\t>s1\t10\t0\t10\t10\t10\t60\n")
    out = tmp_path / "decorated.gfa"
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    rc = climain.main(["evalGFA", "-g", str(gaf), "-o", str(out)])
    assert rc == 0
    assert out.exists()
