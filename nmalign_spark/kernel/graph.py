"""Shortest-path over the subsegmentation interval graph.

Replaces ``scipy.sparse.csgraph.shortest_path(csgraph=csr_matrix(dense),
indices=0, return_predecessors=True)`` used by the reference at
/root/reference/nmalign/lib/align.py:8-9,214-215 — scipy is not available in
this environment, and the graph is tiny (L+1 nodes for a string of length L),
so a plain O(V^2) Dijkstra is the right tool.

Fidelity notes (SURVEY.md §4.3):

* ``csr_matrix(dense)`` stores only entries ``!= 0`` — an *exact-zero* edge
  (a perfect partial alignment, score == 100) silently disappears.  We
  replicate that: zero-weight entries are treated as absent edges.
* ``np.inf`` entries are nonzero, so csr keeps them, but an infinite edge can
  never relax a distance — equivalent to absent; we skip them too.
* predecessors init to -9999 like scipy; relaxation is strict (<), so the
  first settled path wins ties exactly as Dijkstra with a monotone queue.
"""

from __future__ import annotations

import numpy as np

__all__ = ["dijkstra_from0"]


def dijkstra_from0(dense: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Single-source (node 0) Dijkstra on a dense weighted digraph.

    ``dense[i, j]`` is the weight of edge i->j; entries that are exactly 0 or
    +inf are absent (csr semantics, see module docstring).

    Returns ``(dist, predecessors)`` with scipy's conventions:
    unreachable nodes have ``dist == inf`` and ``pred == -9999``.
    """
    n = dense.shape[0]
    dist = np.full(n, np.inf)
    pred = np.full(n, -9999, dtype=np.int64)
    visited = np.zeros(n, dtype=bool)
    dist[0] = 0.0
    adj = np.where((dense == 0.0) | ~np.isfinite(dense), np.inf, dense)
    for _ in range(n):
        u = -1
        best = np.inf
        # deterministic: smallest index among unvisited minimal distances
        cand = np.where(~visited, dist, np.inf)
        u = int(np.argmin(cand))
        best = cand[u]
        if not np.isfinite(best):
            break
        visited[u] = True
        nd = best + adj[u]
        better = nd < dist
        if better.any():
            dist[better] = nd[better]
            pred[better] = u
    return dist, pred
