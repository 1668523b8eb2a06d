"""Candidate-path scoring against read alignment paths.

Equivalent of the reference's evaluatePath (src/eval.cpp:63-108): optionally
drop reads touching nodes outside the candidate (counting `unaligned` per
offending step), NW-align each remaining read forward and reverse-complement,
classify best score < 0 as bad else good.

The batched entry point scores a whole frontier of candidates in one device
call (the reference re-scores sequentially per expansion; scores are
deterministic per candidate so batching preserves output parity).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

from ..ops.nw_path import Step, batched_best_scores, nw_align_oracle, revcomp_path


@dataclass
class PathScore:
    bad: int = 0
    good: int = 0
    unaligned: int = 0


def filter_mask(candidate: Sequence[Step], read_paths: Sequence[Sequence[Step]]) -> Tuple[np.ndarray, int]:
    """(keep_mask, unaligned) — a read is dropped if ANY of its steps visits
    a node id outside the candidate's id set; every offending step counts
    toward `unaligned` (reference src/eval.cpp:81-91)."""
    ids = {s[0] for s in candidate}
    keep = np.ones(len(read_paths), dtype=bool)
    unaligned = 0
    for i, rp in enumerate(read_paths):
        bad_steps = sum(1 for s in rp if s[0] not in ids)
        if bad_steps:
            keep[i] = False
            unaligned += bad_steps
    return keep, unaligned


def evaluate_candidates(candidates: Sequence[Sequence[Step]],
                        read_paths: Sequence[Sequence[Step]],
                        filter_alignments: bool = True) -> List[PathScore]:
    """Score a frontier of candidates in one batched device call."""
    results = [PathScore() for _ in candidates]
    if not read_paths:
        return results
    masks = []
    for ci, cand in enumerate(candidates):
        if filter_alignments:
            keep, unaligned = filter_mask(cand, read_paths)
            results[ci].unaligned = unaligned
        else:
            keep = np.ones(len(read_paths), dtype=bool)
        masks.append(keep)
    union = np.any(np.stack(masks), axis=0) if masks else np.zeros(0, bool)
    idx = np.nonzero(union)[0]
    if idx.size == 0:
        return results
    sub_reads = [read_paths[i] for i in idx]
    scores = batched_best_scores(candidates, sub_reads)  # (C, |idx|)
    for ci in range(len(candidates)):
        m = masks[ci][idx]
        s = scores[ci][m]
        results[ci].bad = int((s < 0).sum())
        results[ci].good = int((s >= 0).sum())
    return results


def evaluate_path_printing(candidate: Sequence[Step],
                           read_paths: Sequence[Sequence[Step]],
                           read_names: Sequence[str],
                           id_to_name,
                           out) -> PathScore:
    """Single-candidate scoring that also prints each read's best alignment
    (reference evalPath mode, src/eval.cpp:100-105): the read row of the
    pairwise alignment, then qName and best score, tab-separated."""
    result = PathScore()
    cand = [Step(s[0], s[1]) for s in candidate]
    for rp, qname in zip(read_paths, read_names):
        rp = [Step(s[0], s[1]) for s in rp]
        fw = nw_align_oracle(cand, rp)
        rc = nw_align_oracle(cand, revcomp_path(rp))
        best = fw if fw.score > rc.score else rc  # tie -> rc, like the reference
        if best.score < 0:
            result.bad += 1
        else:
            result.good += 1
        out.write(_alignment_string(best.a, best.b, id_to_name)
                  + "\t" + qname + "\t" + str(best.score) + "\n")
    return result


def _alignment_string(a: List[Step], b: List[Step], id_to_name) -> str:
    """The read ("B") row of a pairwise path alignment
    (reference include/alignments.h:98-122 with doNotReturnRef=true):
    '-'*(width) for a gap, 'name+or' for a mismatch, '.'*(width) for a match;
    every cell is followed by ','."""
    parts = []
    for sa, sb in zip(a, b):
        if sb.id == -1:
            parts.append("-" * (len(id_to_name(sa.id)) + 1) + ",")
        elif sa != sb:
            parts.append(id_to_name(sb.id) + sb.orientation + ",")
        else:
            parts.append("." * (len(id_to_name(sb.id)) + 1) + ",")
    return "".join(parts)
