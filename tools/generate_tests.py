#!/usr/bin/env python3
"""Regenerate golden `.tst` files (reference gfalign-generate-tests
equivalent, src/generate-tests.cpp:7-90 + include/validate.h:77-95).

Each test.N.tst = line 1 command (relative to the validate dir's parent),
line 2 the literal `embedded`, remaining lines the command's stdout —
exactly the format cli/validate.py and the reference's gfalign-validate
consume.  The covered matrix mirrors the reference generator:
evalGFA on random1/random2 x {plain, --graph-statistics, --sort-alignment},
search on random3, filter on random3 (src/generate-tests.cpp:37-81).

Usage:
    python tools/generate_tests.py <testFiles-dir> <output-dir> [-y]

WARNING (like the reference): existing *.tst in <output-dir> are deleted;
only run when the framework is in a known-good state.  -y skips the
confirmation prompt.
"""

from __future__ import annotations

import io
import os
import pathlib
import sys


MATRIX = [
    ("evalGFA", "-f testFiles/random1.gfa", "-g testFiles/random1.gaf"),
    ("evalGFA", "-f testFiles/random1.gfa",
     "-g testFiles/random1.gaf --graph-statistics"),
    ("evalGFA", "-f testFiles/random1.gfa",
     "-g testFiles/random1.gaf --sort-alignment"),
    ("evalGFA", "-f testFiles/random2.gfa", "-g testFiles/random2.gaf"),
    ("evalGFA", "-f testFiles/random2.gfa",
     "-g testFiles/random2.gaf --graph-statistics"),
    ("evalGFA", "-f testFiles/random2.gfa",
     "-g testFiles/random2.gaf --sort-alignment"),
    ("search", "-f testFiles/random3.gfa",
     "-n testFiles/random3.search_nodelist.tsv -s 1 -d 4"),
    ("filter", "-g testFiles/random3.gaf",
     "-n testFiles/random3.filter_nodelist.ls -o gaf"),
]


def gen_test(i: int, mode: str, input_arg: str, args: str, out_dir: pathlib.Path,
             run_dir: pathlib.Path) -> pathlib.Path:
    """Write validateFiles-format test.<i>.tst by running the in-process CLI
    from `run_dir` (where the testFiles/ symlink or copy lives)."""
    from gfalign_tpu.cli.main import main

    cmdline = f"gfalign {mode} {input_arg} {args}".rstrip()
    argv = cmdline.split()[1:]
    old_cwd, old_stdout = os.getcwd(), sys.stdout
    buf = io.StringIO()
    try:
        os.chdir(run_dir)
        sys.stdout = buf
        main(argv)
    finally:
        os.chdir(old_cwd)
        sys.stdout = old_stdout
    tst = out_dir / f"test.{i}.tst"
    with open(tst, "w") as fh:
        fh.write(cmdline + "\nembedded\n")
        fh.write(buf.getvalue())
    return tst


def generate(test_files_dir: str, out_dir: str) -> list:
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for old in out.glob("*.tst"):
        old.unlink()
    run_dir = out.parent
    tf = run_dir / "testFiles"
    if not tf.exists():
        tf.symlink_to(pathlib.Path(test_files_dir).resolve())
    written = []
    for i, (mode, input_arg, args) in enumerate(MATRIX):
        written.append(gen_test(i, mode, input_arg, args, out, run_dir))
        print(f"generating: {written[-1]}")
    return written


def main_cli() -> int:
    args = [a for a in sys.argv[1:] if a != "-y"]
    assume_yes = "-y" in sys.argv[1:]
    if len(args) != 2:
        print(__doc__)
        return 2
    if not assume_yes:
        print("WARNING: only run this program if the program is in a working state")
        print("WARNING: previous validate files will be deleted")
        if input("continue? (Y/N) ").strip().lower() != "y":
            print("validate generation cancelled")
            return 0
    generate(args[0], args[1])
    return 0


if __name__ == "__main__":
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    raise SystemExit(main_cli())
