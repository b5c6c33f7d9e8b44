"""Traveling salesman — shortest path visiting all points.

Reference: ``traveling_salesman_problem``
(``networkanalysis/traveling_salesman.py:11-160``) — a driver-side
tiny-n operator there too (it builds a full networkx graph and runs
christofides).  No networkx exists in this environment, so the same
ALGORITHM is implemented from scratch in numpy: Prim MST → EXACT
minimum-weight perfect matching on the odd-degree vertices (the
Edmonds blossom algorithm, ``kernels/blossom.py`` — round 5 closed the
greedy-matching delta, restoring the true 1.5 approximation bound) →
Euler circuit (Hierholzer) → shortcutting, then a full 2-opt polish.
``_greedy_matching`` remains as the cheap reference the structure test
compares against.  Deterministic throughout (fixed start,
lexicographic tie-breaks, first-improvement sweep).  ``method="nn"`` keeps the previous
nearest-neighbor construction.  ``return_to_start=False`` drops the
longest edge of the best cycle (the standard open-tour reduction; the
reference inserts a zero-cost dummy node instead).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def _tour_length(order: np.ndarray, d: np.ndarray) -> float:
    return float(d[order, np.roll(order, -1)].sum())


def _nearest_neighbor_tour(d: np.ndarray, start: int = 0) -> np.ndarray:
    n = len(d)
    seen = np.zeros(n, dtype=bool)
    order = [start]
    seen[start] = True
    for _ in range(n - 1):
        cur = order[-1]
        cand = np.where(seen, np.inf, d[cur])
        nxt = int(np.argmin(cand))
        order.append(nxt)
        seen[nxt] = True
    return np.asarray(order)


def _two_opt(order: np.ndarray, d: np.ndarray, max_rounds: int = 50) -> np.ndarray:
    n = len(order)
    improved = True
    rounds = 0
    while improved and rounds < max_rounds:
        improved = False
        rounds += 1
        for i in range(n - 1):
            a, b = order[i], order[(i + 1) % n]
            for j in range(i + 2, n):
                if i == 0 and j == n - 1:
                    continue
                c, e = order[j], order[(j + 1) % n]
                delta = (d[a, c] + d[b, e]) - (d[a, b] + d[c, e])
                if delta < -1e-12:
                    order[i + 1 : j + 1] = order[i + 1 : j + 1][::-1]
                    improved = True
                    b = order[(i + 1) % n]
    return order


def _prim_mst(d: np.ndarray) -> list[tuple[int, int]]:
    """Prim's MST over a dense distance matrix; deterministic (argmin
    takes the lowest index on ties)."""
    n = len(d)
    in_tree = np.zeros(n, dtype=bool)
    in_tree[0] = True
    best = d[0].copy()
    parent = np.zeros(n, dtype=np.int64)
    edges = []
    for _ in range(n - 1):
        cand = np.where(in_tree, np.inf, best)
        v = int(np.argmin(cand))
        edges.append((int(parent[v]), v))
        in_tree[v] = True
        upd = d[v] < best
        best[upd] = d[v][upd]
        parent[upd] = v
    return edges


def _greedy_matching(odd: list[int], d: np.ndarray) -> list[tuple[int, int]]:
    """Greedy min-weight perfect matching over the odd-degree vertices
    (|odd| is even by the handshake lemma)."""
    pairs = sorted(
        (d[a, b], a, b) for i, a in enumerate(odd) for b in odd[i + 1 :]
    )
    used: set[int] = set()
    match = []
    for _, a, b in pairs:
        if a not in used and b not in used:
            match.append((a, b))
            used.update((a, b))
    return match


def _euler_shortcut(n: int, multi_edges: list[tuple[int, int]]) -> np.ndarray:
    """Hierholzer Euler circuit over the MST+matching multigraph (every
    degree is even by construction), shortcut to a Hamiltonian order."""
    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in multi_edges:
        adj[a].append(b)
        adj[b].append(a)
    for lst in adj:
        lst.sort(reverse=True)  # pop() walks lowest neighbor first
    stack, circuit = [0], []
    removed: dict[tuple[int, int], int] = {}
    while stack:
        v = stack[-1]
        while adj[v] and removed.get((v, adj[v][-1]), 0) > 0:
            removed[(v, adj[v][-1])] -= 1
            adj[v].pop()
        if adj[v]:
            u = adj[v].pop()
            removed[(u, v)] = removed.get((u, v), 0) + 1
            stack.append(u)
        else:
            circuit.append(stack.pop())
    seen = np.zeros(n, dtype=bool)
    order = []
    for v in circuit:
        if not seen[v]:
            seen[v] = True
            order.append(v)
    return np.asarray(order)


def _blossom_matching(odd: list[int], d: np.ndarray) -> list[tuple[int, int]]:
    """EXACT minimum-weight perfect matching over the odd-degree
    vertices (kernels/blossom.py, the Edmonds/Galil O(n^3) primal-dual
    algorithm) — the matching that gives Christofides its 1.5 bound.
    Distances are quantized to int64 at ~1e-12 relative resolution so
    every dual update is exact."""
    from ..kernels.blossom import min_weight_perfect_matching

    sub = d[np.ix_(odd, odd)]
    scale = float(2**40 - 1) / max(1.0, float(sub.max()))
    di = np.round(sub * scale).astype(np.int64)
    np.fill_diagonal(di, 0)
    return [(odd[a], odd[b]) for a, b in min_weight_perfect_matching(di)]


def _christofides_tour(d: np.ndarray) -> np.ndarray:
    mst = _prim_mst(d)
    deg = np.zeros(len(d), dtype=np.int64)
    for a, b in mst:
        deg[a] += 1
        deg[b] += 1
    odd = [int(v) for v in np.where(deg % 2 == 1)[0]]
    match = _blossom_matching(odd, d)
    return _euler_shortcut(len(d), mst + match)


def traveling_salesman_problem(
    points: DataFrame,
    return_to_start: bool = True,
    x_col: str = "x",
    y_col: str = "y",
    method: str = "christofides",
) -> DataFrame:
    """Visiting order over the (small, collected) point set; returns
    (seq, x, y) — seq 0..n (closing point repeated when
    return_to_start, like the reference's roundtrip list)."""
    spark = points.sparkSession
    rows = points.select(x_col, y_col).dropDuplicates().collect()
    pts = np.array([(r[0], r[1]) for r in rows], dtype=np.float64)
    if len(pts) <= 2:
        out = [(i, float(p[0]), float(p[1])) for i, p in enumerate(pts)]
        return spark.createDataFrame(out, f"seq int, {x_col} double, {y_col} double")
    # deterministic input order: sort by (y, x) like node ids
    o = np.lexsort((pts[:, 0], pts[:, 1]))
    pts = pts[o]
    dx = pts[:, 0][:, None] - pts[:, 0][None, :]
    dy = pts[:, 1][:, None] - pts[:, 1][None, :]
    d = np.sqrt(dx * dx + dy * dy)
    if method == "christofides":
        construct = _christofides_tour(d)
    elif method == "nn":
        construct = _nearest_neighbor_tour(d)
    else:
        raise ValueError(f"unknown TSP method {method!r}")
    order = _two_opt(construct, d)
    seq = list(order)
    if return_to_start:
        seq = seq + [seq[0]]
    else:
        # open the cycle at its longest edge
        edges = [(d[seq[i], seq[(i + 1) % len(seq)]], i) for i in range(len(seq))]
        _, cut = max(edges)
        seq = seq[cut + 1 :] + seq[: cut + 1]
    out = [(i, float(pts[p, 0]), float(pts[p, 1])) for i, p in enumerate(seq)]
    return spark.createDataFrame(out, f"seq int, {x_col} double, {y_col} double")
