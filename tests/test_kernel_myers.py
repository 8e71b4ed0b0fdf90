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
