"""Graph kernels: adjacency build + Dijkstra, pure Python/numpy.

The reference delegates routing to igraph's C core
(``sgis/networkanalysis/networkanalysis.py:1502-1525`` builds
``igraph.Graph.TupleList``; ``_od_cost_matrix.py:51-55`` calls
``graph.distances``).  No igraph exists here, so the kernel is a heapq
Dijkstra over a CSR-ish adjacency built once per executor from the
broadcast edge list — the Spark pattern is *broadcast graph, partition
the origins* (SURVEY §3.3), so this code runs once per origin inside an
Arrow batch, never on the driver.
"""

from __future__ import annotations

import heapq

import numpy as np


class Adjacency:
    """CSR adjacency over string-or-int node ids."""

    def __init__(self, src, dst, w):
        nodes = {}
        for n in src:
            nodes.setdefault(n, len(nodes))
        for n in dst:
            nodes.setdefault(n, len(nodes))
        self.idx = nodes
        self.rev = list(nodes)
        n = len(nodes)
        si = np.fromiter((nodes[s] for s in src), dtype=np.int64, count=len(src))
        di = np.fromiter((nodes[d] for d in dst), dtype=np.int64, count=len(dst))
        wv = np.asarray(w, dtype=np.float64)
        order = np.argsort(si, kind="stable")
        si, di, wv = si[order], di[order], wv[order]
        self.indptr = np.searchsorted(si, np.arange(n + 1))
        self.nbr = di
        self.wgt = wv

    def __len__(self):
        return len(self.rev)


def dijkstra_paths(adj: Adjacency, source, targets, banned=None) -> dict:
    """Shortest paths with predecessor tracking: {target: [node, ...]}.
    Deterministic tie-break: a relaxation only replaces the predecessor on
    a STRICT improvement, and the heap orders by (cost, node index), so
    equal-cost alternatives resolve identically everywhere.

    ``banned``: set of (u, v) INTERNAL index pairs to skip — the k-routes
    drop-middle re-solve (reference ``_get_route.py:142-189`` deletes
    igraph edges from a per-OD graph copy; a banned set over the shared
    CSR avoids copying the graph per pair)."""
    if source not in adj.idx:
        return {}
    n = len(adj)
    dist = np.full(n, np.inf)
    pred = np.full(n, -1, dtype=np.int64)
    s = adj.idx[source]
    dist[s] = 0.0
    want = {adj.idx[t] for t in targets if t in adj.idx}
    heap = [(0.0, s)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist[u]:
            continue
        for k in range(adj.indptr[u], adj.indptr[u + 1]):
            v = adj.nbr[k]
            if banned is not None and (u, v) in banned:
                continue
            nd = d + adj.wgt[k]
            if nd < dist[v]:
                dist[v] = nd
                pred[v] = u
                heapq.heappush(heap, (nd, v))
    out = {}
    for t in want:
        if not np.isfinite(dist[t]):
            continue
        path = [t]
        while path[-1] != s:
            path.append(int(pred[path[-1]]))
        out[adj.rev[t]] = [adj.rev[p] for p in reversed(path)]
    return out


def k_routes_for_pair(adj: Adjacency, source, target, k: int,
                      drop_middle_percent: float) -> list[list]:
    """k alternative low-cost routes: shortest path, then drop the middle
    ``drop_middle_percent`` of its edges and re-solve, k times (reference
    ``_get_route.py:142-189``: n_keep = round((m - m*pct/100)/2), min 1,
    banned edges accumulate across iterations)."""
    banned: set = set()
    out = []
    for _ in range(k):
        paths = dijkstra_paths(adj, source, [target], banned=banned)
        p = paths.get(target)
        if p is None:
            break
        out.append(p)
        m = len(p) - 1
        if m <= 0:
            break
        n_keep = int(round((m - m * drop_middle_percent / 100.0) / 2.0))
        if n_keep == 0:
            n_keep = 1
        for i in range(n_keep, m - n_keep):
            banned.add((adj.idx[p[i]], adj.idx[p[i + 1]]))
    return out


def dijkstra(adj: Adjacency, source, targets=None, cutoff=None) -> dict:
    """Distances from ``source`` to all nodes (or until all ``targets``
    settled / ``cutoff`` exceeded).  Returns {node_id: cost}."""
    if source not in adj.idx:
        return {}
    n = len(adj)
    dist = np.full(n, np.inf)
    s = adj.idx[source]
    dist[s] = 0.0
    want = None if targets is None else {adj.idx[t] for t in targets if t in adj.idx}
    found = set()
    heap = [(0.0, s)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist[u]:
            continue
        if cutoff is not None and d > cutoff:
            break
        if want is not None:
            if u in want:
                found.add(u)
                if len(found) == len(want):
                    break
        for k in range(adj.indptr[u], adj.indptr[u + 1]):
            v = adj.nbr[k]
            nd = d + adj.wgt[k]
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    out = {}
    it = want if want is not None else range(n)
    for v in it:
        if np.isfinite(dist[v]):
            out[adj.rev[v]] = float(dist[v])
    return out
