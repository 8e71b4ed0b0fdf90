"""Bit-parallel Myers kernel: parity with the scalar DP oracle across word
boundaries, bucket mixes, and empty inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from nmalign_spark.kernel.lev import levenshtein_distance
from nmalign_spark.kernel.myers import myers_cdist


def test_word_boundaries():
    qs = ["a" * k for k in (0, 1, 5, 63, 64, 65, 127, 128, 129)]
    cs = ["a" * k + "b" for k in (0, 40, 63, 64, 65, 130)] + ["", "xyz"]
    d = myers_cdist(qs, cs)
    for i, q in enumerate(qs):
        for j, c in enumerate(cs):
            assert d[i, j] == levenshtein_distance(q, c), (i, j)


def test_mixed_buckets_one_call():
    qs = ["short", "x" * 70, "", "y" * 140, "another short one"]
    cs = ["short", "x" * 69 + "z", "w" * 200]
    d = myers_cdist(qs, cs)
    for i, q in enumerate(qs):
        for j, c in enumerate(cs):
            assert d[i, j] == levenshtein_distance(q, c), (i, j)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet="ab c", max_size=80), min_size=1, max_size=4),
       st.lists(st.text(alphabet="ab c", max_size=80), min_size=1, max_size=4))
def test_hypothesis_parity(l1, l2):
    d = myers_cdist(l1, l2)
    for i, a in enumerate(l1):
        for j, b in enumerate(l2):
            assert d[i, j] == levenshtein_distance(a, b)


def test_unicode_beyond_bmp():
    d = myers_cdist(["a😀b", "😀😀"], ["ab", "a😀b", "😀"])
    assert d[0].tolist() == [1, 0, 2]
    assert d[1].tolist() == [2, 2, 1]


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(
        st.lists(st.text(alphabet="ab c", max_size=70), min_size=0, max_size=5),
        st.lists(st.text(alphabet="ab c", max_size=90), min_size=0, max_size=5)),
    min_size=1, max_size=8))
def test_cdist_many_matches_per_doc(docs):
    """Batched flat scoring == per-document calls, including empty docs and
    >64-char queries (which take the per-document fallback)."""
    from nmalign_spark.kernel.myers import myers_cdist_many
    many = myers_cdist_many(docs)
    for (qs, cs), got in zip(docs, many):
        want = myers_cdist(qs, cs)
        assert got.shape == want.shape
        if got.size:
            assert np.array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.tuples(
        st.lists(st.text(alphabet="ab c", max_size=60), min_size=1, max_size=4),
        st.lists(st.text(alphabet="ab c", max_size=60), min_size=1, max_size=4)),
    min_size=1, max_size=6),
    st.one_of(st.none(), st.floats(min_value=0.1, max_value=0.9)))
def test_cdist_levenshtein_many_matches_per_doc(docs, cutoff):
    """Similarity wrapper parity: float32 values, cutoff zeroing, processor."""
    from nmalign_spark.kernel.lev import (cdist_levenshtein,
                                          cdist_levenshtein_many)
    proc = str.lower
    many = cdist_levenshtein_many(docs, score_cutoff=cutoff, processor=proc)
    for (qs, cs), got in zip(docs, many):
        want = cdist_levenshtein(qs, cs, score_cutoff=cutoff, processor=proc)
        assert got.dtype == np.float32
        assert np.array_equal(got, want)
