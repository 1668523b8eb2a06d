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

# Realistic pass: step counts drawn from the r4/r5 tangle fixture
# (bench/.workload/tangle.gaf read-path step histogram — regenerate with
# bench/pipeline_bench.py; the snapshot below keeps bench.py
# self-contained).  Mean ~7 steps, max 12, so the realistic batch pads to
# stride 16 and the reported rate includes the padding waste a real
# tangle search pays — the uniform pass alone is blind to it.
REALISTIC_HIST = {3: 8, 4: 28, 5: 46, 6: 41, 7: 37, 8: 33, 9: 32, 10: 26,
                  11: 13, 12: 4}
REAL_STRIDE = 16


def _realistic_lengths(rng, count):
    ks = np.array(sorted(REALISTIC_HIST), np.int32)
    ws = np.array([REALISTIC_HIST[int(k)] for k in ks], np.float64)
    try:  # prefer the live fixture when present
        hist = {}
        with open(ROOT / "bench" / ".workload" / "tangle.gaf") as fh:
            for line in fh:
                cols = line.split("\t")
                if len(cols) > 6:
                    n = cols[5].count(">") + cols[5].count("<")
                    if 0 < n <= REAL_STRIDE:
                        hist[n] = hist.get(n, 0) + 1
        if hist:
            ks = np.array(sorted(hist), np.int32)
            ws = np.array([hist[int(k)] for k in ks], np.float64)
    except OSError:
        pass
    return rng.choice(ks, size=count, p=ws / ws.sum()).astype(np.int32)


def baseline_records_per_s(n: int = N, m: int = M) -> float:
    src = ROOT / "bench" / "baseline_nw.cpp"
    binary = ROOT / "bench" / ".baseline_nw"
    if not binary.exists() or binary.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["g++", "-O3", "-march=native", "-o", str(binary), str(src)],
                       check=True)
    out = subprocess.run([str(binary), str(C), str(min(R, 256)), str(n), str(m)],
                         check=True, capture_output=True, text=True).stdout
    for line in out.splitlines():
        if line.startswith("records_per_s="):
            return float(line.split("=")[1])
    raise RuntimeError(f"baseline produced no rate: {out!r}")


def device_records_per_s(realistic: bool = False) -> float:
    import jax

    from gfalign_tpu.ops.nw_path import _pallas_eligible, nw_best_scores

    if _pallas_eligible():
        from gfalign_tpu.ops.nw_pallas import nw_best_scores_pallas as kernel
    else:
        kernel = nw_best_scores

    rng = np.random.default_rng(7)
    n_s, m_s = (REAL_STRIDE, REAL_STRIDE) if realistic else (N, M)

    def batch():
        if realistic:
            a_len = _realistic_lengths(rng, C)
            b_len = _realistic_lengths(rng, R)
        else:
            a_len = np.full((C,), n_s, np.int32)
            b_len = np.full((R,), m_s, np.int32)
        return [jax.device_put(x) for x in [
            (rng.integers(0, 8, (C, n_s)) * 4
             + rng.integers(0, 2, (C, n_s))).astype(np.int32),
            a_len,
            (rng.integers(0, 8, (R, m_s)) * 4
             + rng.integers(0, 2, (R, m_s))).astype(np.int32),
            b_len,
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


def _realistic_mean() -> int:
    ks = sorted(REALISTIC_HIST)
    tot = sum(REALISTIC_HIST.values())
    return max(1, round(sum(k * REALISTIC_HIST[k] for k in ks) / tot))


def pinned_baseline() -> dict:
    """The C++ baseline rates (uniform + realistic-mean shapes), pinned on
    first run: re-measuring every round on this noisy shared box made
    vs_baseline swing 277->152 between rounds with no code change
    (VERDICT r3 weak item 6).  The pin records the box + flags; delete
    the file to re-pin after a hardware change.  The realistic baseline
    runs the scalar NW at the fixture's MEAN lengths — exact-length
    scalar cost is mean(n)*mean(m) in expectation, and the C++ loop pays
    no padding, so this is the honest CPU-side counterpart of the mixed
    device batch."""
    pinned = json.loads(PIN_FILE.read_text()) if PIN_FILE.exists() else {}
    changed = False
    if "records_per_s" not in pinned:
        import platform

        pinned.update({
            "records_per_s": baseline_records_per_s(),
            "flags": "g++ -O3 -march=native",
            "box": platform.platform(),
            "cpus": os.cpu_count(),
            "shapes": {"C": C, "R": min(R, 256), "N": N, "M": M},
        })
        changed = True
    if "records_per_s_realistic" not in pinned:
        nm = _realistic_mean()
        pinned["records_per_s_realistic"] = baseline_records_per_s(nm, nm)
        pinned["shapes_realistic"] = {"C": C, "R": min(R, 256),
                                      "N": nm, "M": nm}
        changed = True
    if changed:
        PIN_FILE.write_text(json.dumps(pinned, indent=1) + "\n")
    return pinned


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
    pinned = pinned_baseline()
    base_u = float(pinned["records_per_s"])
    base_r = float(pinned["records_per_s_realistic"])
    fresh_base = baseline_records_per_s()
    value_u = device_records_per_s()
    value_r = device_records_per_s(realistic=True)
    # headline = the realistic fixture-mix rate (includes the padding
    # waste a real tangle search pays); the uniform 64x64 rate is kept
    # alongside for cross-round comparability
    print(json.dumps({
        "metric": "gaf_records_evaluated_per_s_per_chip",
        "value": round(value_r, 2),
        "unit": "records/s",
        "vs_baseline": round(value_r / base_r, 3),
        "workload": "realistic_fixture_mix",
        "uniform_value": round(value_u, 2),
        "uniform_vs_baseline": round(value_u / base_u, 3),
        "baseline_pinned": round(base_u, 2),
        "baseline_pinned_realistic": round(base_r, 2),
        "baseline_fresh": round(fresh_base, 2),
        # rounds <= 4 reported the uniform workload as their headline —
        # compare prev_value against uniform_value, not value
        "prev_value": prev_round_value(),
        "prev_value_basis": "uniform",
    }))


if __name__ == "__main__":
    main()
