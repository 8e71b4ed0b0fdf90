"""Bit-identity of the incremental-frontier fast loop vs the reference loop.

The fast path (kernel/assign.py `_match_fast` + `_Frontier`) must be
indistinguishable from the literal reference transcription
(`_match_reference`, align.py:62-166): same assignments, same float32
scores, same subseg spans, for every input.  Two layers:

1. `_Frontier.insert` invariant: after every insertion the maintained mask
   equals `build_monotonicity` built from scratch — over randomized insert
   orders including the adversarial crossing patterns (reversals, zig-zags,
   equal-column subseg inserts).
2. end-to-end `match` equality on randomized string corpora across the
   cutoff/try_subseg configuration matrix.
"""

from __future__ import annotations

import numpy as np
import pytest

from nmalign_spark.kernel.assign import (_Frontier, _match_fast,
                                         _match_reference, build_monotonicity,
                                         match)
from nmalign_spark.kernel.lev import cdist_levenshtein


def _check_sequence(dim1, dim2, inserts):
    f = _Frontier(dim1, dim2)
    for a, b in inserts:
        f.insert(a, b)
        expect = build_monotonicity(dim1, dim2,
                                    sorted(zip(f.rows, f.cols)))
        got = f.mono.astype(bool)
        assert (got == expect).all(), (
            f"frontier diverged after insert ({a},{b}); "
            f"pairs={sorted(zip(f.rows, f.cols))}\n"
            f"got:\n{got.astype(int)}\nexpect:\n{expect.astype(int)}")


def test_frontier_identity_and_reversal():
    # monotone diagonal
    _check_sequence(5, 5, [(i, i) for i in range(5)])
    # full reversal (maximally crossing)
    _check_sequence(5, 5, [(i, 4 - i) for i in range(5)])
    # reversal inserted outside-in and inside-out
    _check_sequence(6, 6, [(0, 5), (5, 0), (1, 4), (4, 1), (2, 3), (3, 2)])
    _check_sequence(6, 6, [(2, 3), (3, 2), (1, 4), (4, 1), (0, 5), (5, 0)])


def test_frontier_equal_column_subseg_pattern():
    # subsegmentation assigns several rows to the SAME column
    _check_sequence(6, 4, [(1, 2), (2, 2), (3, 2), (0, 3), (5, 0)])
    _check_sequence(6, 4, [(3, 1), (1, 1), (2, 1), (4, 1)])


def test_frontier_rectangular_and_edges():
    _check_sequence(1, 7, [(0, 3)])
    _check_sequence(7, 1, [(i, 0) for i in (3, 0, 6, 1, 5, 2, 4)])
    _check_sequence(4, 9, [(0, 8), (3, 0), (1, 4), (2, 2)])


def test_frontier_fuzz():
    rng = np.random.default_rng(4242)
    for _ in range(300):
        dim1 = int(rng.integers(1, 12))
        dim2 = int(rng.integers(1, 12))
        n = int(rng.integers(1, dim1 + 1))
        rows = rng.choice(dim1, size=n, replace=False)
        cols = rng.integers(0, dim2, size=n)
        _check_sequence(dim1, dim2, list(zip(rows.tolist(), cols.tolist())))


def _rand_lists(rng, max_lines=10):
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"]
    n2 = int(rng.integers(1, max_lines))
    l2 = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 8))))
          for _ in range(n2)]
    # l1: noisy/permuted/merged view of l2 plus junk
    l1 = []
    for s in l2:
        r = rng.random()
        if r < 0.15:
            continue                      # dropped
        chars = list(s)
        for _ in range(int(rng.integers(0, 3))):
            if chars:
                pos = int(rng.integers(0, len(chars)))
                chars[pos] = chr(ord("a") + int(rng.integers(0, 26)))
        l1.append("".join(chars))
    if rng.random() < 0.3 and len(l1) > 1:
        p = int(rng.integers(0, len(l1) - 1))
        l1[p], l1[p + 1] = l1[p + 1], l1[p]
    if rng.random() < 0.3:
        l1.insert(int(rng.integers(0, len(l1) + 1)), "junk noise xx")
    if not l1:
        l1 = ["placeholder"]
    return l1, l2


@pytest.mark.parametrize("cutoff,try_subseg", [
    (None, False), (None, True), (0.4, False), (0.4, True), (0.9, True)])
def test_match_fast_equals_reference_fuzz(cutoff, try_subseg):
    rng = np.random.default_rng(20260817)
    for _ in range(120):
        l1, l2 = _rand_lists(rng)
        dist = cdist_levenshtein(l1, l2, score_cutoff=cutoff)
        fast = _match_fast(l1, l2, dist.copy(), cutoff, try_subseg,
                           lambda s: s)
        ref = _match_reference(l1, l2, dist.copy(), cutoff, try_subseg,
                               None, lambda s: s)
        assert fast[0].shape == ref[0].shape
        assert (fast[0] == ref[0]).all(), (l1, l2, fast[0], ref[0])
        assert fast[1].dtype == ref[1].dtype == np.float32
        # bit-identical scores, not just approximately equal
        assert (fast[1].view(np.uint32) == ref[1].view(np.uint32)).all()


def test_match_dispatches_reference_for_zero_length_l2():
    # '' in l2 makes length 0: the -inf masking would be ill-defined, so
    # match() must take the reference path — and still work
    l1 = ["abc", "def"]
    l2 = ["abc", "", "def"]
    res, scores = match(l1, l2)
    assert res.tolist() == [0, 2]
    assert scores.tolist() == [1.0, 1.0]


def test_match_public_api_uses_fast_path_values():
    l1 = ["erste zeile hier", "zweite zeile dort", "dritte zeile"]
    l2 = ["Erste Zeile hier", "zweite  Zeile dort!", "dritte zeile"]
    res, scores = match(l1, l2, try_subseg=True)
    ref = _match_reference(l1, l2,
                           cdist_levenshtein(l1, l2), None, True, None,
                           lambda s: s)
    assert (res == ref[0]).all()
    assert (scores == ref[1]).all()
