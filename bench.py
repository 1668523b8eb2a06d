#!/usr/bin/env python3
"""Framework benchmark: GAF records evaluated per second per chip.

One "record evaluation" = one read path scored against one candidate path
(NW forward DP + traceback score, forward AND reverse-complement — exactly
the per-record work of the reference's evaluatePath, src/eval.cpp:92-94).

Baseline: the reference publishes no numbers (BASELINE.md), so the baseline
is the reference's own hot loop — single-threaded C++ NW with identical
semantics (bench/baseline_nw.cpp) on this machine's CPU, the same hardware
class the reference runs on.  vs_baseline = device rate / CPU rate.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "records/s", "vs_baseline": N}

MEASUREMENT CORRECTION (do not regress): over the TPU tunnel on this box,
`block_until_ready` returns BEFORE execution completes and the transport
caches repeated identical dispatches.  Any timing must therefore use
distinct device-resident batches (one dispatch each), force completion via
a device->host fetch of the last output, and report the best of several
passes (the tunnel has multi-second congestion windows).  See the
methodology comment in device_records_per_s().
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

# workload: candidate/read path lengths typical of tangle work, sized so the
# device pipeline is saturated (per-dispatch transport overhead is ~40% of
# a C=64,R=4096 batch; C=128,R=16384 amortizes it below measurement noise)
C, R, N, M = 128, 16384, 64, 64


def baseline_records_per_s() -> float:
    src = ROOT / "bench" / "baseline_nw.cpp"
    binary = ROOT / "bench" / ".baseline_nw"
    if not binary.exists() or binary.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["g++", "-O3", "-march=native", "-o", str(binary), str(src)],
                       check=True)
    out = subprocess.run([str(binary), str(C), str(min(R, 256)), str(N), str(M)],
                         check=True, capture_output=True, text=True).stdout
    for line in out.splitlines():
        if line.startswith("records_per_s="):
            return float(line.split("=")[1])
    raise RuntimeError(f"baseline produced no rate: {out!r}")


def device_records_per_s() -> float:
    import jax

    from gfalign_tpu.ops.nw_path import _pallas_eligible, nw_best_scores

    if _pallas_eligible():
        from gfalign_tpu.ops.nw_pallas import nw_best_scores_pallas as kernel
    else:
        kernel = nw_best_scores

    rng = np.random.default_rng(7)

    def batch():
        return [jax.device_put(x) for x in [
            (rng.integers(0, 8, (C, N)) * 4
             + rng.integers(0, 2, (C, N))).astype(np.int32),
            np.full((C,), N, np.int32),
            (rng.integers(0, 8, (R, M)) * 4
             + rng.integers(0, 2, (R, M))).astype(np.int32),
            np.full((R,), M, np.int32),
        ]]

    # Methodology (all three are load-bearing on this transport):
    #   * distinct device-resident batches, each dispatched exactly once per
    #     timed pass — the transport caches repeated identical dispatches;
    #   * completion is forced by a device->host FETCH of the last output:
    #     block_until_ready over the tunnel returns before execution
    #     finishes (measured 0.04 ms/batch "block" vs 65 ms real);
    #   * several independent passes, best pass reported — the transport
    #     has multi-second congestion windows.
    # Device execution is in dispatch order, so fetching a scalar of the
    # LAST output implies every batch in the pass completed.
    fn = jax.jit(kernel)
    warm = batch()
    _ = np.asarray(fn(*warm)[0, 0])  # compile + warm
    best = float("inf")
    for _ in range(4):
        batches = [batch() for _ in range(6)]
        t0 = time.perf_counter()
        out = None
        for b in batches:
            out = fn(*b)
        _ = np.asarray(out[0, 0])
        best = min(best, (time.perf_counter() - t0) / len(batches))
        time.sleep(1.0)
    return C * R / best


PIN_FILE = ROOT / "bench" / "baseline_pinned.json"


def pinned_baseline() -> float:
    """The C++ baseline rate, pinned on first run: re-measuring it every
    round on this noisy shared box made vs_baseline swing 277->152 between
    rounds with no code change (VERDICT r3 weak item 6).  The pin records
    the box + flags; delete the file to re-pin after a hardware change."""
    if PIN_FILE.exists():
        return float(json.loads(PIN_FILE.read_text())["records_per_s"])
    import platform

    rate = baseline_records_per_s()
    PIN_FILE.write_text(json.dumps({
        "records_per_s": rate,
        "flags": "g++ -O3 -march=native",
        "box": platform.platform(),
        "cpus": os.cpu_count(),
        "shapes": {"C": C, "R": min(R, 256), "N": N, "M": M},
    }, indent=1) + "\n")
    return rate


def prev_round_value():
    """Device rate recorded by the previous round's driver run, for
    noise-vs-regression classification."""
    best = None
    for p in sorted(ROOT.glob("BENCH_r*.json")):
        try:
            d = json.loads(p.read_text())
            v = d.get("parsed", d).get("value")
            if v is not None:
                best = float(v)
        except Exception:
            continue
    return best


def main() -> None:
    os.chdir(ROOT)
    base = pinned_baseline()
    fresh_base = baseline_records_per_s()
    value = device_records_per_s()
    print(json.dumps({
        "metric": "gaf_records_evaluated_per_s_per_chip",
        "value": round(value, 2),
        "unit": "records/s",
        "vs_baseline": round(value / base, 3),
        "baseline_pinned": round(base, 2),
        "baseline_fresh": round(fresh_base, 2),
        "prev_value": prev_round_value(),
    }))


if __name__ == "__main__":
    main()
