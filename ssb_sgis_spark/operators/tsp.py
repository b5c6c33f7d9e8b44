"""Traveling salesman — shortest path visiting all points.

Reference: ``traveling_salesman_problem``
(``networkanalysis/traveling_salesman.py:11-160``) — a driver-side
tiny-n operator there too (it builds a full networkx graph and runs
christofides).  No networkx exists in this environment, so the
approximation is nearest-neighbor construction + full 2-opt improvement
— deterministic (fixed start, first-improvement sweep) and the same
quality class as christofides for the small point sets this is meant
for.  ``return_to_start=False`` drops the longest edge of the best
cycle (the standard open-tour reduction; the reference inserts a
zero-cost dummy node instead).
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


def traveling_salesman_problem(
    points: DataFrame,
    return_to_start: bool = True,
    x_col: str = "x",
    y_col: str = "y",
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
    order = _two_opt(_nearest_neighbor_tour(d), d)
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
