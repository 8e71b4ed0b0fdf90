"""Greedy monotonicity-weighted assignment of two string lists.

Portions of the greedy loop below closely follow bertsky/nmalign
(MIT License, Copyright Robert Sachunsky) — the mandate is byte-identical
output of that exact algorithm (argmax tie-breaks, float dtypes, cutoff
rules), so the control flow necessarily mirrors lib/align.py.

Faithful re-derivation of ``nmalign.lib.align.match``
(/root/reference/nmalign/lib/align.py:17-166) with the rapidfuzz ``cdist``
swapped for the native NumPy kernel.  The interactive prompt path
(SURVEY.md §2.10 U3) is supported LOCAL-ONLY via the ``interactive=``
callback below — the Spark operators never pass it (no executor I/O).

This is the sequential per-document core: it runs once per group inside the
Arrow kernel (`applyInPandas`/`mapInPandas`); document-level parallelism is
Spark's job.  The loop itself must stay sequential — each iteration's
monotonicity bonus depends on all previous assignments (align.py:87-96), so
splitting it would change results.
"""

from __future__ import annotations

import numpy as np

from ..functions.normalize import make_preprocessor
from .lev import cdist_levenshtein
from .subseg import SUBSEG_ACC_MAX, SUBSEG_LEN_MIN, match_subseg

__all__ = ["match"]


def match(l1, l2, workers=1, normalization=None, cutoff=None, try_subseg=False,
          dist=None, interactive=None):
    """Force alignment of string lists; returns ``(result, scores)``.

    Contract identical to the reference (align.py:17-33): ``result`` is an
    int array of shape (N,) — or (3, N) = (idx, beg, end) when ``try_subseg``
    — mapping each l1 index to an l2 index (−1 = unmatched / cut off);
    ``scores`` is float32 in [0, 1].  ``workers`` is accepted for signature
    parity but ignored: intra-matrix threading (align.py:60) is superseded by
    Spark task parallelism (SURVEY.md §2.10 U4).

    ``dist`` optionally injects a precomputed N×M float32 similarity matrix
    (the skew-salted path scores row chunks in parallel Spark tasks and
    reassembles the matrix before this sequential loop — SURVEY.md §4
    custom-work #1; values must equal ``cdist_levenshtein`` output, which is
    exact because every cell is a pure function of one (l1[i], l2[j]) pair).

    ``interactive`` optionally supplies an approval callback
    ``cb(prompt_text) -> bool`` for the reference's per-pair gate
    (align.py:131-145): a rejected subsegmentation falls back to the
    whole-pair prompt, a rejected pair sets ``dist[i,j] = -inf`` and the
    loop retries (same prompt texts as the reference).  LOCAL-ONLY (the CLI
    ``-i`` flag): Spark executors have no interactive I/O (SURVEY.md §2.10
    U3), so the distributed operators never pass it.
    """
    assert len(l1) > 0
    assert len(l2) > 0
    assert isinstance(l1[0], str)
    assert isinstance(l2[0], str)
    preprocess = make_preprocessor(normalization)
    if dist is None:
        dist = cdist_levenshtein(l1, l2, score_cutoff=cutoff,
                                 processor=preprocess)
    else:
        assert dist.shape == (len(l1), len(l2))
        if interactive is not None:
            # rejections write -inf into dist; never mutate a
            # caller-supplied matrix in place
            dist = dist.copy()
    dim1 = len(l1)
    dim2 = len(l2)
    idx1 = np.arange(dim1)
    idx2 = np.arange(dim2)
    keep1 = np.ones(dim1, dtype=bool)
    keep2 = np.ones(dim2, dtype=bool)
    result = -1 * np.ones(dim1, dtype=int)
    if try_subseg:
        # result must also hold start and end pos (align.py:69-72)
        result = np.tile(result, (3, 1))
        result_idx, result_beg, result_end = result
    else:
        result_idx = result
    # normalized similarity favours short sequences, but we want longest
    # matches first -> multiply with sequence length (align.py:75-78)
    scores = np.zeros(dim1, dtype=dist.dtype)
    length = np.tile(list(map(len, l2)), (dim1, 1))
    for _ in range(dim1):
        distview = dist[np.ix_(keep1, keep2)]
        if not distview.size:
            break
        # monotonicity bonus: block-triangular mask from the current
        # assignment frontier (align.py:84-96)
        monotonicity = np.zeros(dist.shape, dtype=bool)
        prev_ind1, prev_ind2 = 0, 0
        for ind1, ind2 in list(zip(np.flatnonzero(~keep1), result_idx[~keep1])) + [(dim1, dim2)]:
            if (ind1 >= prev_ind1) == (ind2 >= prev_ind2):
                monotonicity[prev_ind1:ind1, prev_ind2:ind2] = True
            else:
                monotonicity[prev_ind1:ind1, :] = False
                monotonicity[:, ind2:prev_ind2] = False
            prev_ind1, prev_ind2 = ind1, ind2
        monotonicity = monotonicity[np.ix_(keep1, keep2)]
        coverage = 1.0 - monotonicity.shape[0] / dim1  # sigmoid in nr of assigned idx1
        coverage = 0.5 / (1 + np.exp(5 * (0.5 - coverage)))  # align.py:97-98
        lengthview = length[np.ix_(keep1, keep2)]
        # score = (similarity + monotonicity * coverage) * length (align.py:100-101)
        priority = (distview + coverage * monotonicity) * lengthview
        # row-major first-occurrence argmax — determinism-critical (align.py:102)
        ind1, ind2 = np.unravel_index(np.argmax(priority, axis=None), priority.shape)
        scoresfor2 = distview[:, ind2]  # for subseg below
        indxesfor2 = idx1[keep1]        # for subseg below
        score = distview[ind1, ind2]
        ind1 = idx1[keep1][ind1]
        ind2 = idx2[keep2][ind2]
        seg1 = l1[ind1]
        seg2 = l2[ind2]
        assert result_idx[ind1] < 0
        assert keep1[ind1]
        assert keep2[ind2]
        # try subsegmentation / splitting ind2 (align.py:115-130)
        if (try_subseg and
                score < SUBSEG_ACC_MAX and
                ' ' in seg2 and
                len(seg2) > SUBSEG_LEN_MIN and
                len(seg2) - len(seg1) > SUBSEG_LEN_MIN / 2):
            subseg = match_subseg(l1, seg2, scoresfor2, indxesfor2,
                                  min_score=max(score, cutoff or 0),
                                  processor=preprocess)
        else:
            subseg = []
        if len(subseg) and interactive is not None:
            text = ("Found subsegmentation:\n" +
                    "".join("%d/%d[%d:%d] (%.2f)\n> %s\n< %s\n" % (
                        subind1, ind2, begin, end, subscore,
                        l1[subind1], seg2[begin:end])
                        for subind1, begin, end, subscore
                        in sorted(subseg, key=lambda sub: sub[1])) + "Accept")
            if not interactive(text):
                subseg = []
        if not len(subseg):
            if interactive is not None:
                text = ("Found %d/%d (%.2f):\n> %s\n< %s\nAccept"
                        % (ind1, ind2, score, seg1, seg2))
                if not interactive(text):
                    dist[ind1, ind2] = -np.inf  # skip next time (align.py:144)
                    continue
            if cutoff and score < cutoff:
                if not try_subseg:
                    # without subsegmentation, follow-up results will only be
                    # worse (align.py:147-150)
                    break
                keep2[ind2] = False  # don't try again (align.py:152)
                continue
            result_idx[ind1] = ind2
            scores[ind1] = score
            keep1[ind1] = False
            keep2[ind2] = False
        else:
            keep2[ind2] = False
            for subind1, begin, end, subscore in subseg:
                result_idx[subind1] = ind2
                result_beg[subind1] = begin
                result_end[subind1] = end
                scores[subind1] = subscore
                keep1[subind1] = False
    return result, scores
