"""Tests for the interval-graph shortest path and match_subseg
(align.py:168-243 semantics, scipy-free)."""

import numpy as np
import pytest

from nmalign_spark.kernel.graph import dijkstra_from0
from nmalign_spark.kernel.subseg import match_subseg


def test_dijkstra_basic_path():
    g = np.full((4, 4), np.inf)
    g[0, 1] = 1.0
    g[1, 2] = 1.0
    g[0, 2] = 5.0
    g[2, 3] = 1.0
    dist, pred = dijkstra_from0(g)
    assert dist.tolist() == [0.0, 1.0, 2.0, 3.0]
    assert pred.tolist() == [-9999, 0, 1, 2]


def test_dijkstra_zero_edge_dropped_like_csr():
    # csr_matrix(dense) keeps only nonzero entries -> a 0.0 edge is absent
    g = np.full((3, 3), np.inf)
    g[0, 1] = 0.0   # dropped!
    g[1, 2] = 1.0
    g[0, 2] = 7.0
    dist, pred = dijkstra_from0(g)
    assert dist[1] == np.inf and pred[1] == -9999
    assert dist[2] == 7.0 and pred[2] == 0


def test_dijkstra_unreachable():
    g = np.full((3, 3), np.inf)
    g[1, 2] = 1.0
    dist, pred = dijkstra_from0(g)
    assert dist[0] == 0.0
    assert np.isinf(dist[1]) and np.isinf(dist[2])
    assert pred.tolist() == [-9999, -9999, -9999]


def test_match_subseg_returns_ordered_spans():
    part1 = "the quickk brown fox junps"
    part2 = "ovre the lazy sleping dog"
    seg2 = "the quick brown fox jumps over the lazy sleeping dog"
    l1 = [part1, part2, "an unrelated trailing line"]
    scoresfor2 = np.array([0.5, 0.45, 0.1], dtype=np.float32)
    indxesfor2 = np.arange(3)
    subseg = match_subseg(l1, seg2, scoresfor2, indxesfor2, min_score=0.5)
    assert len(subseg) == 2
    (i1, b1, e1, s1), (i2, b2, e2, s2) = subseg
    assert (i1, i2) == (0, 1)
    assert 0 <= b1 < e1 <= b2 < e2 <= len(seg2)
    assert 0 < s1 <= 1 and 0 < s2 <= 1


def test_match_subseg_rejects_single_candidate():
    # fewer than 2 plausible candidates -> [] (align.py:175-176)
    out = match_subseg(["only one"], "a long enough merged line here",
                       np.array([-1.0]), np.arange(1))
    assert out == []


def test_match_subseg_rejects_when_not_better_than_min_score():
    part1 = "the quickk brown fox junps"
    part2 = "ovre the lazy sleping dog"
    seg2 = "the quick brown fox jumps over the lazy sleeping dog"
    l1 = [part1, part2]
    out = match_subseg(l1, seg2, np.array([0.5, 0.45], dtype=np.float32),
                       np.arange(2), min_score=0.999)
    assert out == []
