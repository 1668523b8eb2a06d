#!/usr/bin/env python3
"""Regenerate tests/data/ regression locks from the CURRENT implementation
(the reference's gfalign-generate-tests equivalent, src/generate-tests.cpp).

Run only when an intentional behavior change invalidates the locks; review
the diff before committing.

    python tests/regenerate_locks.py
"""

import io
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from tests.test_regression_locks import CASES, DATA, REFERENCE  # noqa: E402


def main() -> None:
    import tempfile

    from gfalign_tpu.cli.main import main as cli_main

    tmp = pathlib.Path(tempfile.mkdtemp())
    (tmp / "testFiles").symlink_to(REFERENCE / "testFiles")
    old_cwd = os.getcwd()
    DATA.mkdir(exist_ok=True)
    for expected_file, argv in CASES:
        buf = io.StringIO()
        old_stdout = sys.stdout
        try:
            os.chdir(tmp)
            sys.stdout = buf
            cli_main(list(argv))
        finally:
            os.chdir(old_cwd)
            sys.stdout = old_stdout
        (DATA / expected_file).write_text(buf.getvalue())
        print(f"wrote {expected_file} ({len(buf.getvalue())} bytes)")
    # decorated GFA
    old_stdout = sys.stdout
    try:
        os.chdir(tmp)
        sys.stdout = io.StringIO()
        cli_main(["evalGFA", "-f", "testFiles/random2.gfa",
                  "-g", "testFiles/random2.gaf", "-o", "out.gfa"])
    finally:
        os.chdir(old_cwd)
        sys.stdout = old_stdout
    (DATA / "decorated.gfa").write_text((tmp / "out.gfa").read_text())
    print("wrote decorated.gfa")


if __name__ == "__main__":
    main()
