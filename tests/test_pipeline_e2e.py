"""Full tangle-resolution pipeline end-to-end (BASELINE.json config 5 shape,
single-host): simulate a diploid-style assembly tangle, simulate reads,
then run align -> filter -> search -> evalPath entirely through the CLI,
checking the search resolves the true traversal."""

import io
import os
import pathlib
import random
import sys

import pytest


def run_cli(argv, cwd):
    from gfalign_tpu.cli.main import main

    old_cwd, old_stdout = os.getcwd(), sys.stdout
    buf = io.StringIO()
    try:
        os.chdir(cwd)
        sys.stdout = buf
        code = main(argv)
    finally:
        os.chdir(old_cwd)
        sys.stdout = old_stdout
    return code, buf.getvalue()


@pytest.fixture(scope="module")
def assembly(tmp_path_factory):
    """Flanked tangle: IN -> {A1|A2} -> MID -> {B1|B2} -> OUT; the true
    haplotype traverses A1 and B2.  Segment sequences are random and
    distinct, so reads disambiguate the traversal."""
    tmp = tmp_path_factory.mktemp("pipeline")
    rng = random.Random(11)

    def seq(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    segs = {"IN": seq(120), "A1": seq(90), "A2": seq(90), "MID": seq(100),
            "B1": seq(80), "B2": seq(80), "OUT": seq(120)}
    links = [("IN", "+", "A1", "+"), ("IN", "+", "A2", "+"),
             ("A1", "+", "MID", "+"), ("A2", "+", "MID", "+"),
             ("MID", "+", "B1", "+"), ("MID", "+", "B2", "+"),
             ("B1", "+", "OUT", "+"), ("B2", "+", "OUT", "+")]
    gfa = tmp / "asm.gfa"
    with gfa.open("w") as f:
        f.write("H\tVN:Z:1.2\n")
        for name, s in segs.items():
            f.write(f"S\t{name}\t{s}\n")
        for a, oa, b, ob in links:
            f.write(f"L\t{a}\t{oa}\t{b}\t{ob}\t0M\n")

    truth = segs["IN"] + segs["A1"] + segs["MID"] + segs["B2"] + segs["OUT"]
    reads = tmp / "reads.fq"
    with reads.open("w") as f:
        n_reads = 40
        for i in range(n_reads):
            start = rng.randrange(0, len(truth) - 150)
            length = rng.randrange(120, min(260, len(truth) - start))
            r = truth[start:start + length]
            if rng.random() < 0.3:  # mixed-orientation sequencing
                from gfalign_tpu.graph.stats import revcomp
                r = revcomp(r)
            f.write(f"@sim{i}\n{r}\n+\n{'!' * len(r)}\n")
    return tmp, gfa, reads


def test_full_pipeline(assembly):
    tmp, gfa, reads = assembly

    # 1. align: simulated reads -> GAF
    code, _ = run_cli(["align", "-f", "asm.gfa", "-r", "reads.fq",
                       "-o", "aln.gaf"], tmp)
    assert code == 0
    gaf_lines = (tmp / "aln.gaf").read_text().strip().split("\n")
    assert len(gaf_lines) >= 40  # every read placed

    # 2. filter to the tangle region (drop flank-only alignments)
    nodelist = tmp / "tangle.ls"
    nodelist.write_text("IN\nA1\nA2\nMID\nB1\nB2\nOUT\n")
    code, out = run_cli(["filter", "-g", "aln.gaf", "-n", "tangle.ls",
                         "-o", "filtered_out.gaf"], tmp)
    assert code == 0
    assert (tmp / "filtered_out.gaf").exists()

    # 3. search the tangle: true traversal should win
    search_nodes = tmp / "search.tsv"
    search_nodes.write_text("A1\t1\nA2\t1\nMID\t1\nB1\t1\nB2\t1\n")
    code, out = run_cli(["search", "-f", "asm.gfa", "-g", "filtered_out.gaf",
                         "-n", "search.tsv", "-s", "IN", "-d", "OUT"], tmp)
    assert code == 0
    rows = [r.split("\t") for r in out.strip().split("\n") if r]
    assert rows, "search printed no paths"
    best = rows[-1]  # improving-paths mode: last printed row is the best
    assert best[7] == "IN+,A1+,MID+,B2+,OUT+", out

    # 4. evalPath: the true path scores better than the wrong haplotype
    def alt_of(path):
        code, out = run_cli(["evalPath", "-f", "asm.gfa", "-g", "filtered_out.gaf",
                             "-p", path], tmp)
        assert code == 0
        return int(out.strip().split("\n")[-1].split("\t")[2])

    true_alt = alt_of("IN+,A1+,MID+,B2+,OUT+")
    wrong_alt = alt_of("IN+,A2+,MID+,B1+,OUT+")
    assert true_alt < wrong_alt  # lower alt = better support
