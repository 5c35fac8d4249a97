"""Pure-Python/numpy oracle for the four vertex programs.

Implements EXACTLY the conventions pinned in linkgraph/conventions.py
(SURVEY.md §2.1 — the empty reference checkout makes these normative).
The Spark engine must match this oracle: PageRank ``allclose(atol=1e-6)``,
WCC / label propagation / triangle counts exactly (BASELINE.json north_rule).

All functions take a directed edge array ``edges`` of shape (E, 2) int64 and
the vertex count ``n`` (vertex ids are dense in [0, n)).
"""

from __future__ import annotations

import numpy as np

from linkgraph.conventions import (
    LP_ITERS,
    PR_DAMPING,
    PR_EPS,
    PR_INIT,
    PR_MAX_ITERS,
)


def _dedup(edges: np.ndarray) -> np.ndarray:
    if len(edges) == 0:
        return edges.reshape(0, 2)
    return np.unique(edges[edges[:, 0] != edges[:, 1]], axis=0)


def symmetrize(edges: np.ndarray) -> np.ndarray:
    """Undirected simple graph as a deduplicated directed edge set (both
    directions present), self-loops removed."""
    e = _dedup(edges)
    return _dedup(np.vstack([e, e[:, ::-1]]))


def out_degrees(edges: np.ndarray, n: int) -> np.ndarray:
    return np.bincount(edges[:, 0], minlength=n)


def pagerank(
    edges: np.ndarray,
    n: int,
    damping: float = PR_DAMPING,
    eps: float = PR_EPS,
    max_iters: int = PR_MAX_ITERS,
) -> tuple[np.ndarray, int]:
    """Pull PageRank: r0 = 1-d; r(v) = (1-d) + d * sum r(u)/outdeg(u).

    Dangling vertices contribute nothing. Returns (ranks, iterations_run).
    """
    e = _dedup(edges)
    deg = out_degrees(e, n).astype(np.float64)
    rank = np.full(n, PR_INIT if damping == PR_DAMPING else 1.0 - damping)
    src, dst = e[:, 0], e[:, 1]
    iters = 0
    for iters in range(1, max_iters + 1):
        contrib = rank[src] / deg[src]
        sums = np.zeros(n)
        np.add.at(sums, dst, contrib)
        new_rank = (1.0 - damping) + damping * sums
        delta = np.abs(new_rank - rank).max() if n else 0.0
        rank = new_rank
        if delta < eps:
            break
    return rank, iters


def wcc(edges: np.ndarray, n: int) -> np.ndarray:
    """Weakly connected components: comp(v) = min vertex id in component."""
    e = symmetrize(edges)
    comp = np.arange(n, dtype=np.int64)
    src, dst = e[:, 0], e[:, 1]
    while True:
        incoming = comp.copy()
        np.minimum.at(incoming, dst, comp[src])
        if np.array_equal(incoming, comp):
            return comp
        comp = incoming


def label_propagation(edges: np.ndarray, n: int, iters: int = LP_ITERS) -> np.ndarray:
    """Synchronous LP, argmax neighbor-label count, min-label tie-break."""
    e = symmetrize(edges)
    src, dst = e[:, 0], e[:, 1]
    labels = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        new_labels = labels.copy()
        # per-vertex neighbor label histogram; vectorized via sort of
        # (dst, neighbor_label) pairs
        nb = labels[src]
        order = np.lexsort((nb, dst))
        d_sorted, l_sorted = dst[order], nb[order]
        if len(d_sorted) == 0:
            break
        # run-length encode (dst, label) pairs
        boundary = np.ones(len(d_sorted), dtype=bool)
        boundary[1:] = (d_sorted[1:] != d_sorted[:-1]) | (l_sorted[1:] != l_sorted[:-1])
        starts = np.flatnonzero(boundary)
        counts = np.diff(np.append(starts, len(d_sorted)))
        grp_dst = d_sorted[starts]
        grp_label = l_sorted[starts]
        # argmax count, tie -> smallest label: sort by (dst, -count, label)
        sel = np.lexsort((grp_label, -counts, grp_dst))
        first = np.ones(len(sel), dtype=bool)
        gd = grp_dst[sel]
        first[1:] = gd[1:] != gd[:-1]
        winners_dst = gd[first]
        winners_label = grp_label[sel][first]
        new_labels[winners_dst] = winners_label
        labels = new_labels
    return labels


def triangle_counts(edges: np.ndarray, n: int) -> np.ndarray:
    """Per-vertex triangle counts on the symmetrized simple graph."""
    e = symmetrize(edges)
    # canonical a < b undirected edge set
    und = np.unique(np.sort(e, axis=1), axis=0)
    adj: list[set[int]] = [set() for _ in range(n)]
    for a, b in und:
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    tri = np.zeros(n, dtype=np.int64)
    for a, b in und:
        a, b = int(a), int(b)
        common = adj[a] & adj[b]
        for c in common:
            if a < b < c:  # count each triangle once at its sorted orientation
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    return tri
