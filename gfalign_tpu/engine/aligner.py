"""align mode: in-house sequence-to-graph aligner producing GAF.

The reference outsources this to GraphAligner via std::system
(src/main.cpp:167-169); here it is the framework's flagship component:
seed on host, batch-extend on device (banded DP over candidate path
sequences), emit GraphAligner-compatible GAF records.

Round-1 status: engine scaffold; the full seed-extend pipeline lands with
ops/seqalign.  Invoking it before then reports the capability cleanly.
"""

from __future__ import annotations

import sys


def align_mode(graph, read_files, out_file: str, preset: str = "hifi") -> None:
    from .graph_align import run_graph_aligner
    run_graph_aligner(graph, read_files, out_file, preset)

