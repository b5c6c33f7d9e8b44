"""Hexagonal cell index — the H3-style companion to the Morton quadtree.

The north star names "H3/S2 cells" as the page-partitioning index.  The
engine's primary key is the Morton quadtree (``cells.py``) because square
cells compose into compact ``[start, end)`` range covers; this module adds
the true HEXAGONAL binning H3 is known for — equal-area-ish cells whose
six neighbors are all edge-adjacent at the SAME center distance (squares
have 4 edge + 4 corner neighbors at two distances), which is what makes
hex grids the better smoothing/density/halo index.

Pointy-top axial coordinates (q, r) with circumradius ``size`` metres:

    qf = (sqrt(3)/3 * x - 1/3 * y) / size        rf = (2/3 * y) / size

and cube rounding (Amit Patel's canonical formulation) picks the hex whose
CENTER is nearest the point: round the fractional cube coords
(x=qf, y=-qf-rf, z=rf) to the nearest integers, then recompute the
coordinate with the largest rounding error from the other two so
x+y+z == 0 stays true.

Cross-engine exactness: every step is float64 arithmetic emitted from ONE
SQL-text generator that both Spark (``F.expr``) and DuckDB evaluate —
same literals, same operation order, same IEEE doubles.  Rounding is
``floor(v + 0.5)`` (identical in both engines) rather than ``round``
(whose half-even/half-up conventions differ between engines).  The only
residual risk is a point EXACTLY equidistant between hex centers to the
last ulp — measure-zero for continuous inputs and deterministic per
engine either way.

Reference parity: sgis has no hex index (it keys on the SSB 1000 m square
grid, bounds.py:341-372); this is a north-star addition mirroring H3's
``latLngToCell`` / ``gridDisk`` / ``cellToLatLng`` trio at planar-CRS
scale, where the lake's UTM33 page coordinates already live.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hex_qr_sql",
    "hex_cols",
    "hex_bin",
    "hex_density",
    "hex_smooth",
    "hex_qr_np",
    "hex_center_np",
    "hex_neighbors_np",
    "hex_cell_id",
    "hex_dbscan",
    "AXIAL_NEIGHBORS",
]

# the six axial-offset neighbors of any hex (pointy-top): E, W, NE, SW, NW, SE
AXIAL_NEIGHBORS = ((1, 0), (-1, 0), (1, -1), (-1, 1), (0, -1), (0, 1))


# --------------------------------------------------------------- SQL text
def _frac_sql(x_expr: str, y_expr: str, size: float) -> tuple[str, str]:
    # sqrt(3.0) spelled as the function call: both engines produce the
    # correctly-rounded double, so the constant is bit-identical without
    # trusting a hand-typed 17-digit literal.
    #
    # Literal-typing trap: Spark SQL parses bare float literals as
    # DECIMAL, so a pure-literal subexpression like (1.0 / 3.0) evaluates
    # in decimal arithmetic (0.333333 at scale 6) while DuckDB evaluates
    # it as float64 — a 3e-7 relative skew that flips hex assignments
    # near cell edges.  Every division here therefore touches a DOUBLE
    # operand first (decimal-with-double promotes to double in both
    # engines); (sqrt(3.0) / 3.0) is safe because sqrt returns DOUBLE.
    qf = f"(((sqrt(3.0) / 3.0) * ({x_expr}) - ({y_expr}) / 3.0) / {size!r})"
    rf = f"(((({y_expr}) * 2.0) / 3.0) / {size!r})"
    return qf, rf


def hex_qr_sql(x_expr: str, y_expr: str, size: float) -> tuple[str, str]:
    """(q_sql, r_sql) BIGINT axial hex coordinates of point (x, y).

    One generator feeds both engines; subexpressions are textually
    inlined (common-subexpression elimination changes cost, never IEEE
    values), and the whole expression stays a few KB — far under the
    codegen method-size limit.
    """
    qf, rf = _frac_sql(x_expr, y_expr, size)
    yg = f"(-({qf}) - ({rf}))"
    # floor(v + 0.5): Spark floor(double)->LONG, DuckDB ->DOUBLE; values
    # are equal integers either way and the final CAST normalizes types
    rx = f"floor({qf} + 0.5)"
    ry = f"floor({yg} + 0.5)"
    rz = f"floor({rf} + 0.5)"
    dx = f"abs({rx} - ({qf}))"
    dy = f"abs({ry} - ({yg}))"
    dz = f"abs({rz} - ({rf}))"
    fix_x = f"({dx} > {dy} AND {dx} > {dz})"
    fix_y = f"({dy} > {dz})"
    q = f"CAST(CASE WHEN {fix_x} THEN -({ry}) - ({rz}) ELSE {rx} END AS BIGINT)"
    r = (
        f"CAST(CASE WHEN (NOT {fix_x}) AND (NOT {fix_y}) "
        f"THEN -({rx}) - ({ry}) ELSE {rz} END AS BIGINT)"
    )
    return q, r


# ------------------------------------------------------------ Spark side
def hex_cols(x_expr: str, y_expr: str, size: float) -> tuple[Column, Column]:
    """Native Columns for the axial hex coords — pure whole-stage-codegen
    arithmetic, no Python workers, no shuffle."""
    q, r = hex_qr_sql(x_expr, y_expr, size)
    return F.expr(q), F.expr(r)


def hex_bin(
    df: DataFrame,
    size: float,
    x_col: str = "x",
    y_col: str = "y",
    q_col: str = "hex_q",
    r_col: str = "hex_r",
) -> DataFrame:
    """Assign every row to its hex cell (map-only; the hex analogue of
    ``add_grid_id``).  At 10^12 pages this is a scan-speed projection —
    the natural partition/bucket key for hex-local joins."""
    q, r = hex_cols(x_col, y_col, size)
    return df.withColumns({q_col: q, r_col: r})


def hex_density(
    df: DataFrame,
    size: float,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Pages-per-hex histogram: ONE groupBy with map-side combine — the
    shuffle moves at most one row per (hex, map task), never the pages."""
    return (
        hex_bin(df, size, x_col, y_col)
        .groupBy("hex_q", "hex_r")
        .agg(F.count("*").alias("n"))
    )


def hex_smooth(
    df: DataFrame,
    size: float,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Neighborhood-disk density (H3 ``gridDisk(cell, 1)`` rollup): for
    every hex, the page count summed over itself + its 6 neighbors — the
    smoothing/hot-zone primitive hex grids exist for (every contribution
    travels the SAME center distance, which square grids can't offer).

    Scale shape: the per-hex histogram SCATTERS to its 7-cell disk via a
    map-only explode of a literal offset array (no join, no broadcast),
    then ONE groupBy re-aggregates — the shuffle carries at most
    7 × |occupied hexes| rows, never the pages.  Scatter ≡ gather here
    because the disk offsets are symmetric.
    """
    dens = hex_density(df, size, x_col, y_col)
    offsets = ((0, 0), *AXIAL_NEIGHBORS)
    arr = F.array(
        *[
            F.struct(F.lit(a).alias("dq"), F.lit(b).alias("dr"))
            for a, b in offsets
        ]
    )
    return (
        dens.select("hex_q", "hex_r", "n", F.explode(arr).alias("o"))
        .groupBy(
            (F.col("hex_q") + F.col("o.dq")).alias("hex_q"),
            (F.col("hex_r") + F.col("o.dr")).alias("hex_r"),
        )
        .agg(F.sum("n").alias("n_disk"))
    )


# ------------------------------------------------------------ numpy side
def hex_qr_np(
    x: np.ndarray, y: np.ndarray, size: float
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized mirror of :func:`hex_qr_sql` — same float64 op order
    (numpy maps each step to the identical IEEE primitive)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    qf = ((np.sqrt(3.0) / 3.0) * x - y / 3.0) / size
    rf = ((y * 2.0) / 3.0) / size
    yg = -qf - rf
    rx = np.floor(qf + 0.5)
    ry = np.floor(yg + 0.5)
    rz = np.floor(rf + 0.5)
    dx = np.abs(rx - qf)
    dy = np.abs(ry - yg)
    dz = np.abs(rz - rf)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    q = np.where(fix_x, -ry - rz, rx)
    r = np.where(~fix_x & ~fix_y, -rx - ry, rz)
    return q.astype(np.int64), r.astype(np.int64)


def hex_center_np(
    q: np.ndarray, r: np.ndarray, size: float
) -> tuple[np.ndarray, np.ndarray]:
    """Cell center (the inverse map; H3's ``cellToLatLng`` analogue)."""
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    x = size * np.sqrt(3.0) * (q + r / 2.0)
    y = size * 1.5 * r
    return x, y


def hex_neighbors_np(q: np.ndarray, r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The 6-cell ring (H3's ``gridDisk(cell, 1)`` minus the center):
    returns (6*n,) arrays, neighbor blocks in AXIAL_NEIGHBORS order."""
    q = np.asarray(q, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    dq = np.array([d[0] for d in AXIAL_NEIGHBORS], dtype=np.int64)
    dr = np.array([d[1] for d in AXIAL_NEIGHBORS], dtype=np.int64)
    return (q[:, None] + dq[None, :]).ravel(), (r[:, None] + dr[None, :]).ravel()


# ------------------------------------------------------------- hex DBSCAN
# packed cell key: (q + 2^20) * 2^21 + (r + 2^20).  |q|,|r| < 2^20 covers
# ~±4e9 m at 4 km cells — any planar CRS extent; the pack is monotone in
# (q, r) so min-id cluster labels are deterministic.
HEX_PACK_OFF = 1 << 20
HEX_PACK_MUL = 1 << 21


def hex_cell_id(q: Column, r: Column) -> Column:
    """Packed int64 cell id (shared Spark/SQL arithmetic)."""
    return (
        (q + F.lit(HEX_PACK_OFF)) * F.lit(HEX_PACK_MUL) + (r + F.lit(HEX_PACK_OFF))
    ).cast("long")


def hex_dbscan(
    df: DataFrame,
    size: float,
    min_pts: int,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Grid-density clustering (the cell-based DBSCAN family — GriDBSCAN
    / Grid-DBSCAN): hex cells holding ``>= min_pts`` points are DENSE;
    edge-adjacent dense cells merge into one cluster.  Returns one row
    per dense cell: ``(hex_q, hex_r, n, cluster)`` with ``cluster`` the
    MIN packed cell id of the connected dense component — the
    hotspot-extraction primitive over the page lake (urban cores,
    link-farm geo-clusters), fully deterministic (no seeds, no epsilon
    ball probes: the hex tiling IS the epsilon neighborhood).

    Scale shape (10^12 pages):
    * pages collapse to the per-hex histogram in ONE map-side-combined
      groupBy — nothing page-sized ever shuffles again;
    * the dense-cell graph is built by a 3-direction scatter (half the
      axial neighbors, so each undirected adjacency is emitted once)
      + one (q, r) equi-join against the dense set — |dense|-sized;
    * cluster labels via the distributed hash-min + pointer-jumping CC
      (``operators/clusters.connected_components``), whose per-round
      shuffles touch only edge-connected dense cells.

    DBSCAN parity note: classic point-DBSCAN with eps == the hex inradius
    differs at borders (a point can be eps-close to a neighbor-cell core
    without its own cell being dense); the grid variant is the standard
    scale trade and is what this operator implements — exactly.
    """
    from ssb_sgis_spark.operators.clusters import connected_components

    dense = (
        hex_density(df, size, x_col, y_col)
        .filter(F.col("n") >= int(min_pts))
        .withColumn("cid", hex_cell_id(F.col("hex_q"), F.col("hex_r")))
        .localCheckpoint(eager=True)
    )
    # one direction per undirected adjacency
    half = F.array(
        *[
            F.struct(F.lit(a).alias("dq"), F.lit(b).alias("dr"))
            for a, b in ((1, 0), (0, 1), (1, -1))
        ]
    )
    probe = dense.select(
        "cid", F.explode(half).alias("o"), "hex_q", "hex_r"
    ).select(
        F.col("cid").alias("src"),
        (F.col("hex_q") + F.col("o.dq")).alias("hex_q"),
        (F.col("hex_r") + F.col("o.dr")).alias("hex_r"),
    )
    edges = probe.join(
        dense.select("hex_q", "hex_r", F.col("cid").alias("dst")),
        ["hex_q", "hex_r"],
    ).select("src", "dst")
    labels = connected_components(
        edges, dense.select(F.col("cid").alias("id")), id_col="id"
    )
    return dense.join(
        labels, dense["cid"] == labels["id"]
    ).select(
        "hex_q",
        "hex_r",
        "n",
        F.col("component").cast("long").alias("cluster"),
    )
