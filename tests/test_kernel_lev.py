"""Unit tests for the native similarity kernels (SURVEY.md §5: the missing
unit layer — kernel-level tests against hand-computed cases and slow
pure-Python oracles)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nmalign_spark.kernel.lev import (
    ScoreAlignment,
    cdist_levenshtein,
    cdist_partial_ratio,
    indel_distance,
    indel_normalized_similarity,
    levenshtein_distance,
    normalized_similarity,
    partial_ratio,
    partial_ratio_alignment,
)

ALPHA = "abſcd ä"  # small alphabet incl. space + non-ASCII
texts = st.text(alphabet=ALPHA, max_size=24)


# --- scalar oracles: hand-computed cases ---------------------------------

@pytest.mark.parametrize("a,b,d", [
    ("", "", 0),
    ("abc", "", 3),
    ("", "abc", 3),
    ("kitten", "sitting", 3),
    ("flaw", "lawn", 2),
    ("abc", "abc", 0),
    ("ſase", "sase", 1),
])
def test_lev_scalar(a, b, d):
    assert levenshtein_distance(a, b) == d


@pytest.mark.parametrize("a,b,d", [
    ("", "", 0),
    ("abc", "", 3),
    ("kitten", "sitting", 5),   # LCS=4 -> 6+7-8
    ("abc", "abc", 0),
    ("ab", "ba", 2),            # substitution costs 2 via indel
])
def test_indel_scalar(a, b, d):
    assert indel_distance(a, b) == d


def test_normalized_similarity_contract():
    assert normalized_similarity("", "") == 1.0
    assert normalized_similarity("abc", "abc") == 1.0
    assert normalized_similarity("abc", "abd") == pytest.approx(2 / 3)
    # cutoff zeroes, does not filter (rapidfuzz contract, align.py:60)
    assert normalized_similarity("abc", "abd", score_cutoff=0.9) == 0.0
    assert normalized_similarity("abc", "abd", score_cutoff=0.5) == pytest.approx(2 / 3)


# --- batched cdist vs scalar oracle --------------------------------------

@settings(max_examples=60, deadline=None)
@given(st.lists(texts, min_size=1, max_size=5), st.lists(texts, min_size=1, max_size=5),
       st.sampled_from([None, 0.3, 0.7]))
def test_cdist_matches_scalar(l1, l2, cutoff):
    m = cdist_levenshtein(l1, l2, score_cutoff=cutoff)
    assert m.dtype == np.float32
    assert m.shape == (len(l1), len(l2))
    for i, a in enumerate(l1):
        for j, b in enumerate(l2):
            exp = normalized_similarity(a, b, score_cutoff=cutoff)
            assert m[i, j] == pytest.approx(exp, abs=1e-6), (a, b)


def test_cdist_processor_applied_to_both_sides():
    # processor affects scoring only (align.py:54-61)
    m = cdist_levenshtein(["ſa"], ["sa"], processor=lambda s: s.replace("ſ", "s"))
    assert m[0, 0] == 1.0


# --- partial_ratio ---------------------------------------------------------

def _slow_partial_ratio_oneway(s1, s2):
    """One-direction window scan (requires len(s1) <= len(s2))."""
    if not s1 and not s2:
        return 100.0
    if not s1 or not s2:
        return 0.0
    len1, len2 = len(s1), len(s2)
    cs = set(s1)
    wins = []
    wins += [(0, i) for i in range(1, len1) if s2[i - 1] in cs]
    wins += [(i, i + len1) for i in range(0, len2 - len1 + 1) if s2[i + len1 - 1] in cs]
    wins += [(i, len2) for i in range(len2 - len1 + 1, len2) if s2[i] in cs]
    best = 0.0
    for st_, en in wins:
        best = max(best, indel_normalized_similarity(s1, s2[st_:en]))
    return best * 100.0


def _slow_partial_ratio(s1, s2):
    """Brute-force oracle incl. the published equal-length rule: when
    len(s1) == len(s2) and the first pass is not perfect, the roles are
    also tried reversed and the better score wins (the prefix/suffix
    window sets differ between directions, so this can genuinely improve
    — e.g. ('aaaaaa', 'aaaa a'))."""
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    best = _slow_partial_ratio_oneway(s1, s2)
    if best != 100.0 and len(s1) == len(s2):
        best = max(best, _slow_partial_ratio_oneway(s2, s1))
    return best


@pytest.mark.parametrize("s1,s2,exp", [
    ("abc", "xxabcxx", 100.0),            # exact substring
    ("abc", "abc", 100.0),
    ("", "", 100.0),
    ("", "abc", 0.0),
    ("abc", "", 0.0),
])
def test_partial_ratio_basics(s1, s2, exp):
    assert partial_ratio(s1, s2) == exp


@settings(max_examples=80, deadline=None)
@given(texts, texts)
def test_partial_ratio_matches_oracle(s1, s2):
    assert partial_ratio(s1, s2) == pytest.approx(_slow_partial_ratio(s1, s2), abs=1e-9)


def test_partial_ratio_alignment_span():
    res = partial_ratio_alignment("abc", "xxabcxx")
    assert isinstance(res, ScoreAlignment)
    assert res.score == 100.0
    assert (res.dest_start, res.dest_end) == (2, 5)
    # earliest maximal window wins (strict-improvement update rule)
    res2 = partial_ratio_alignment("ab", "abxxab")
    assert (res2.dest_start, res2.dest_end) == (0, 2)


def test_partial_ratio_alignment_swap():
    # needle longer than haystack: fields swapped back
    res = partial_ratio_alignment("xxabcxx", "abc")
    assert res.score == 100.0
    assert (res.src_start, res.src_end) == (2, 5)
    assert (res.dest_start, res.dest_end) == (0, 3)


def test_cdist_partial_ratio_cutoff():
    m = cdist_partial_ratio(["abc", "zzz"], ["xxabcxx"], score_cutoff=50)
    assert m[0, 0] == 100.0
    assert m[1, 0] == 0.0


@settings(max_examples=120, deadline=None)
@given(texts, texts)
def test_window_sims_bitparallel_matches_dp(s1, s2):
    """The <=64-char bit-parallel LCS window scorer must equal the dense DP
    on the exact window set _partial_ratio_impl generates."""
    from nmalign_spark.kernel.lev import _window_sims, _window_sims_dp
    if not s1 or len(s1) > len(s2):
        return
    n, m = len(s1), len(s2)
    windows = [(0, i) for i in range(1, n)]
    windows += [(i, i + n) for i in range(0, m - n + 1)]
    windows += [(i, m) for i in range(m - n + 1, m)]
    if not windows:
        return
    import numpy as np
    got = _window_sims(s1, windows, s2)
    want = _window_sims_dp(s1, windows, s2)
    assert np.allclose(got, want, atol=1e-12)


def test_window_sims_long_needle_fallback():
    from nmalign_spark.kernel.lev import _window_sims, _window_sims_dp
    import numpy as np
    s1 = "ab" * 40                      # 80 chars > 64 -> DP fallback
    s2 = "xx" + s1 + "yy"
    windows = [(i, i + len(s1)) for i in range(0, len(s2) - len(s1) + 1)]
    got = _window_sims(s1, windows, s2)
    want = _window_sims_dp(s1, windows, s2)
    assert np.allclose(got, want)
    assert got.max() == 1.0


def test_cdist_partial_ratio_batched_equals_per_pair():
    """The pooled _window_sims_multi path must be bit-identical to scoring
    every pair individually (incl. equal-length double-orientation, >64-char
    needles via the DP fallback, empties, unicode)."""
    import random

    import numpy as np

    from nmalign_spark.kernel import lev

    rng = random.Random(99)
    alpha = "abcdefg ſüä"
    def rs(lo, hi):
        return "".join(rng.choice(alpha) for _ in range(rng.randrange(lo, hi)))
    queries = [rs(0, 30) for _ in range(12)] + [rs(70, 90), ""]
    choices = [rs(0, 30) for _ in range(6)] + [rs(70, 90), queries[0], ""]
    got = lev.cdist_partial_ratio(queries, choices, score_cutoff=50)
    lev._PR_CACHE.clear()
    want = np.zeros((len(queries), len(choices)), dtype=np.float32)
    for i, q in enumerate(queries):
        for j, c in enumerate(choices):
            lev._PR_CACHE.clear()     # force the unbatched scan per pair
            s = lev.partial_ratio(q, c)
            want[i, j] = 0.0 if s < 50 else s
    assert np.array_equal(got, want)


def test_cdist_more_pairs_than_cache_cap():
    """A cdist call with more distinct pairs than _PR_CACHE_MAX must not
    recompute evicted pooled results (they are held call-locally) and must
    stay bit-identical to the per-pair path."""
    import random

    import numpy as np

    from nmalign_spark.kernel import lev

    rng = random.Random(7)
    alpha = "abcdef "
    def rs():
        return "".join(rng.choice(alpha) for _ in range(rng.randrange(3, 20)))
    queries = [rs() for _ in range(70)]
    choices = [rs() for _ in range(70)]
    assert len(queries) * len(choices) > lev._PR_CACHE_MAX
    lev._PR_CACHE.clear()
    got = lev.cdist_partial_ratio(queries, choices)
    sample = [(i, j) for i in range(0, 70, 9) for j in range(0, 70, 9)]
    for i, j in sample:
        lev._PR_CACHE.clear()
        assert got[i, j] == np.float32(lev.partial_ratio(queries[i],
                                                         choices[j]))


def test_window_sims_multi_chunked_identical(monkeypatch):
    """Chunking the pooled pass (bounded peak allocation) must stay
    bit-identical to one unbounded pass."""
    import random

    import numpy as np

    from nmalign_spark.kernel import lev

    rng = random.Random(21)
    alpha = "abcdeüſ "
    def rs(lo, hi):
        return "".join(rng.choice(alpha) for _ in range(rng.randrange(lo, hi)))
    tasks = []
    for _ in range(25):
        s1 = rs(1, 60)
        s2 = rs(len(s1), len(s1) + 80)
        windows = lev._pr_windows(s1, s2)
        if windows:
            tasks.append((s1, windows, s2))
    want = lev._window_sims_multi_impl(tasks)
    monkeypatch.setattr(lev, "_MULTI_CELL_BUDGET", 500)
    got = lev._window_sims_multi(tasks)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)
