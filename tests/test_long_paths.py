"""Long-path scoring beyond the reference's MAX_N=1001 hard cap
(include/alignments.h:246): our kernels are bounded only by memory, with
read-chunking keeping the working set flat."""

import numpy as np

from gfalign_tpu.ops.nw_path import Step, batched_best_scores, nw_score_oracle, revcomp_path


def test_score_paths_longer_than_reference_cap():
    rng = np.random.default_rng(0)
    n = 1200  # > MAX_N
    cand = [Step(int(v), "+") for v in rng.integers(0, 50, n)]
    # read = noisy subsequence of the candidate
    read = [s for s in cand[100:1100] if rng.random() > 0.02]
    read = [Step(s.id, "-" if rng.random() < 0.01 else s.orientation) for s in read]
    got = batched_best_scores([cand], [read], read_chunk=128)
    want = max(nw_score_oracle(cand, read),
               nw_score_oracle(cand, revcomp_path(read)))
    assert got[0, 0] == want


def test_long_path_batch_chunks():
    rng = np.random.default_rng(1)
    cand = [Step(int(v), "+") for v in rng.integers(0, 20, 600)]
    reads = []
    for _ in range(9):
        start = rng.integers(0, 300)
        reads.append(cand[start:start + int(rng.integers(50, 500))])
    got = batched_best_scores([cand], reads, read_chunk=4)
    for i, r in enumerate(reads):
        want = max(nw_score_oracle(cand, r),
                   nw_score_oracle(cand, revcomp_path(list(r))))
        assert got[0, i] == want
