"""Subsegmentation: split one long right-hand string across several left-hand
segments via local alignment + shortest path over the interval graph.

Portions of the interval-graph construction below closely follow
bertsky/nmalign (MIT License, Copyright Robert Sachunsky) — byte-identical
output of that exact algorithm is the mandate, so the control flow
necessarily mirrors lib/align.py.

Faithful re-derivation of ``match_subseg`` at
/root/reference/nmalign/lib/align.py:168-243, with the scipy/joblib/rapidfuzz
dependencies replaced by native kernels:

* ``cdist(..., scorer=partial_ratio, score_cutoff=50)`` (align.py:181-184)
  -> :func:`nmalign_spark.kernel.lev.cdist_partial_ratio`
* ``partial_ratio_alignment`` per candidate via a joblib pool
  (align.py:196-207) -> sequential loop in submission order (joblib returns
  results ordered by submission, so ordering is identical; parallelism at
  this depth is superseded by Spark task parallelism — SURVEY.md §2.10 U5)
* ``scipy shortest_path(csr_matrix(...), indices=0, return_predecessors)``
  (align.py:214-215) -> :func:`nmalign_spark.kernel.graph.dijkstra_from0`
  (replicating csr's exact-zero edge drop)
"""

from __future__ import annotations

import numpy as np

from .graph import dijkstra_from0
from .lev import cdist_partial_ratio, partial_ratio_alignment

# constants from align.py:12-15
SUBSEG_LEN_MIN = 20   # string length above which subsegmentation is attempted
SUBSEG_ACC_MAX = 0.9  # alignment accuracy below which subsegmentation is attempted
SUBSEG_ACC_MIN = 0.0  # alignment accuracy above which subsegmentation is attempted
PARTIAL_ACC_MIN = 50  # minimum subalignment score during subsegmentation

__all__ = ["match_subseg", "SUBSEG_LEN_MIN", "SUBSEG_ACC_MAX",
           "SUBSEG_ACC_MIN", "PARTIAL_ACC_MIN"]


def match_subseg(l1, seg2, scoresfor2, indxesfor2, min_score=0, processor=None):
    """Find a mutually compatible subsegmentation of ``seg2`` over ``l1``.

    Mirrors align.py:168-243 step for step; returns a list of
    ``(subind1, begin, end, subscore)`` tuples (possibly empty).
    """
    # more than 1 possible match of ind2 (align.py:175-176)
    if np.count_nonzero(scoresfor2 >= SUBSEG_ACC_MIN) < 2:
        return []  # global alignment is just too bad to begin with
    # -- first, fast overview of where to look for matches (align.py:177-186)
    subinds = indxesfor2[scoresfor2 >= SUBSEG_ACC_MIN]
    subl1 = [l1[subind1] for subind1 in subinds]
    subl2 = [seg2]
    subdist = cdist_partial_ratio(subl1, subl2, score_cutoff=PARTIAL_ACC_MIN,
                                  processor=processor)
    if np.count_nonzero(subdist >= PARTIAL_ACC_MIN) < 2:
        return []  # no (good) other matches available
    # -- second, actual local alignments of the good candidates; build the
    #    interval-distance matrix over seg2 positions (align.py:187-211)
    len2 = len(seg2) + 1
    # gap prefill: [i, j] = [j, i] = j - i for i < j (align.py:192-195),
    # diagonal stays +inf — vectorized as |i - j| with inf diagonal
    rng = np.arange(len2)
    subscoresfor2 = np.abs(np.subtract.outer(rng, rng)).astype(np.float64)
    np.fill_diagonal(subscoresfor2, np.inf)
    subindxesfor2 = -1 * np.ones((len2, len2), dtype=int)
    for k in np.nonzero(subdist >= PARTIAL_ACC_MIN)[0]:
        subind1 = subinds[k]
        seg1 = l1[subind1]
        subscore = partial_ratio_alignment(seg1, seg2, processor=processor)
        # zzz: ensure that seg1 is nearly complete (align.py:204)
        subscore.dest_end = min(subscore.dest_end, len(seg2))  # align.py:208
        subdst1 = (1.0 - subscore.score / 100) * (subscore.dest_end - subscore.dest_start)
        subscoresfor2[subscore.dest_start, subscore.dest_end] = subdst1
        subindxesfor2[subscore.dest_start, subscore.dest_end] = subind1
    # -- third, shortest path through the subsegmentation matrix
    #    (align.py:212-215; csr zero-drop semantics in dijkstra_from0)
    subdist, subpath = dijkstra_from0(subscoresfor2)
    # convert to score again and check if better than single match (216-219)
    score = (len2 - subdist[-1]) / len2
    if score <= min_score:
        return []
    # follow up on best path (align.py:220-230)
    subresult = []
    subpos = len2 - 1
    while subpos > 0:
        prepos = max(0, subpath[subpos])
        subscore = subdist[subpos] - subdist[prepos]
        subind = subindxesfor2[prepos, subpos]
        if subind >= 0:
            subresult.append((subind, prepos, subpos, 1.0 - subscore / (subpos - prepos)))
        subpos = prepos
    subresult = list(reversed(subresult))
    # overlap resolution: cut the weaker-scoring side (align.py:231-242)
    for i in range(len(subresult) - 1):
        subind1, beg1, end1, subscore1 = subresult[i]
        subind2, beg2, end2, subscore2 = subresult[i + 1]
        if end1 <= beg2:
            continue
        if subscore1 > subscore2:
            # cut right
            subresult[i + 1] = subind2, end1, end2, subscore2
        else:
            # cut left
            subresult[i] = subind1, beg1, beg2, subscore1
    return subresult
