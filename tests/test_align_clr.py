"""Error-rate validation of the aligner presets (VERDICT r2 item 5).

The reference forwards CLR reads to GraphAligner with
'--seeds-mxm-length 1000 --min-alignment-score 1000
--precise-clipping 0.75' (src/main.cpp:178-182); the in-house preset
maps those to shorter/more anchors, a wider band, and a higher score
floor (graph_align.PRESETS).  These tests check the thing the knobs are
FOR: reads at CLR-class error rates still place at their true locus."""

import re

from gfalign_tpu.engine.graph_align import PRESETS, align_reads
from gfalign_tpu.synth import make_workload

_SEG = re.compile(r"[><]([^><]+)")


def _run(error_rate, params, n_reads=24, seed=5):
    sub = error_rate * 0.6
    ind = error_rate * 0.2
    wl = make_workload(seed=seed, n_segments=80, n_reads=n_reads,
                       seg_len=(150, 400), read_len=(600, 1100),
                       sub_rate=sub, ins_rate=ind, del_rate=ind)
    results = align_reads(wl.graph, wl.reads, params=params)
    truth = {t.name: t for t in wl.truth}
    n = len(results)
    placed = correct = 0
    correct_mapqs, wrong_mapqs = [], []
    for name, qlen, hits in results:
        if not hits:
            continue
        placed += 1
        h = hits[0]
        segs = set(_SEG.findall(h.path_str))
        # a bubble allele "<i>b" is the same locus as backbone "<i>"
        locus = {s.rstrip("b") for s in segs}
        want = {s.rstrip("b") for s in truth[name].walk}
        if (locus & want) and (h.qend - h.qstart) >= 0.6 * qlen:
            correct += 1
            correct_mapqs.append(h.mapq)
        else:
            wrong_mapqs.append(h.mapq)
    return n, placed, correct, correct_mapqs, wrong_mapqs


def test_clr_preset_places_reads_at_12pct_error():
    n, placed, correct, good_q, bad_q = _run(0.12, PRESETS["CLR"])
    assert placed >= 0.95 * n, (placed, n)
    assert correct >= 0.95 * n, (correct, n)
    # mapq calibration: confidently-correct placements dominate
    assert sum(q >= 30 for q in good_q) >= 0.8 * len(good_q)


def test_clr_preset_places_reads_at_5pct_error():
    n, placed, correct, good_q, bad_q = _run(0.05, PRESETS["CLR"])
    assert placed >= 0.95 * n
    assert correct >= 0.95 * n


def test_hifi_preset_degrades_at_clr_error():
    """Documents WHY the preset exists: the hifi configuration loses
    reads at 12% error that the CLR preset keeps (if this ever stops
    failing-over, the preset table can be simplified)."""
    n, _, correct_hifi, _, _ = _run(0.12, PRESETS["hifi"])
    _, _, correct_clr, _, _ = _run(0.12, PRESETS["CLR"])
    assert correct_clr >= correct_hifi


def test_unknown_preset_aborts(tmp_path, capsys):
    import pytest

    from gfalign_tpu.engine.graph_align import run_graph_aligner
    from gfalign_tpu.graph.model import Graph

    g = Graph()
    g.add_segment("s", "ACGT")
    reads = tmp_path / "r.fq"
    reads.write_text("@r\nACGT\n+\nIIII\n")
    with pytest.raises(SystemExit):
        run_graph_aligner(g, [str(reads)], "", preset="nope")
    assert "Could not find preset: nope" in capsys.readouterr().out


def test_cli_align_tunables_and_invoking_echo(tmp_path, capsys):
    """`gfalign align` exposes the AlignParams knobs (both in-house names
    and GraphAligner-compatible aliases) and echoes the resolved
    invocation — the analogue of the reference's `Invoking: <cmd>` line
    (src/main.cpp:167-168)."""
    from gfalign_tpu.cli.main import main as cli_main
    from gfalign_tpu.engine import graph_align as ga

    ref = "/root/reference/testFiles"
    out = tmp_path / "tuned.gaf"
    seen = {}
    orig = ga.align_reads

    def probe(graph, reads, params=None, **kw):
        seen["params"] = params
        return orig(graph, reads, params=params, **kw)

    ga.align_reads = probe
    try:
        rc = cli_main(["align", "-f", f"{ref}/random2.gfa",
                       "-r", f"{ref}/random2.reads.fq", "-o", str(out),
                       "--seeds-mxm-length", "11",
                       "--min-alignment-score", "7",
                       "--band", "260", "--max-anchors", "9"])
    finally:
        ga.align_reads = orig
    assert rc == 0
    echoed = capsys.readouterr().out
    assert "Invoking: gfalign-tpu-align -p hifi" in echoed
    assert "--seed-k 11" in echoed and "--min-score 7" in echoed
    p = seen["params"]
    assert (p.seed_k, p.min_score, p.max_anchors) == (11, 7, 9)
    assert p.band == 264 and p.band % 8 == 0      # rounded to sublanes
    assert out.exists() and out.stat().st_size > 0


def test_clr_preset_at_scale_places_noisy_reads():
    """Seeded CLR path at workload scale: 60 reads at ~10% error (8% sub
    + 2% indel) over a 300-segment graph must all place on their truth
    locus (the wide-band ladder + short anchors are the CLR levers)."""
    import io
    import re
    import sys

    from gfalign_tpu.cli.main import main
    from gfalign_tpu.synth import make_workload, write_workload

    wl = make_workload(seed=31, n_segments=300, n_reads=60,
                       seg_len=(300, 1200), read_len=(1500, 5000),
                       sub_rate=0.08, ins_rate=0.01, del_rate=0.01)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        paths = write_workload(wl, d)
        out = f"{d}/out.gaf"
        old = sys.stdout
        sys.stdout = io.StringIO()
        try:
            main(["align", "-f", paths["gfa"], "-r", paths["reads"],
                  "-o", out, "-p", "CLR"])
        finally:
            sys.stdout = old
        seg_re = re.compile(r"[><]([^><]+)")
        best = {}
        for line in open(out):
            cols = line.rstrip("\n").split("\t")
            if len(cols) >= 12 and cols[0] not in best:
                best[cols[0]] = set(seg_re.findall(cols[5]))
    by_name = {t.name: t for t in wl.truth}
    ok = sum(1 for name, segs in best.items()
             if by_name.get(name) and segs & set(by_name[name].walk))
    assert len(best) == len(wl.truth) == 60
    assert ok >= 58  # >= 96% on-locus at ~10% error
