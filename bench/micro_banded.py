#!/usr/bin/env python3
"""Microbenchmark: one banded_pair_scores shape, compile vs warm split.

Usage: python bench/micro_banded.py [n_pairs] [lr] [lp] [width]
"""
from __future__ import annotations

import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
lr = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
lp = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
width = int(sys.argv[4]) if len(sys.argv) > 4 else 128

from gfalign_tpu.ops import seqalign  # noqa: E402

rng = np.random.default_rng(0)
rc = rng.integers(0, 4, (n, lr)).astype(np.int8)
pc = rng.integers(0, 4, (n, lp)).astype(np.int8)
dl = rng.integers(-64, 64, (n,)).astype(np.int64)

t0 = time.perf_counter()
out = seqalign.banded_pair_scores(rc, pc, dl, width=width)
cold = time.perf_counter() - t0
print(f"cold (compile+run): {cold:.2f}s", file=sys.stderr)

for it in range(3):
    rc2 = rng.integers(0, 4, (n, lr)).astype(np.int8)
    t0 = time.perf_counter()
    out = seqalign.banded_pair_scores(rc2, pc, dl, width=width)
    warm = time.perf_counter() - t0
    cells = n * lr * width
    print(f"warm pass {it}: {warm:.3f}s  {cells / warm / 1e9:.1f} Gcell/s",
          file=sys.stderr)
