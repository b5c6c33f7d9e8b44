"""Areal interpolation: redistribute per-cell counts from the quadtree
Morton tiling onto the (incommensurate) SSB 1 km grid by exact overlap
area — the classic areal-weighting estimator (Goodchild & Lam 1980)
over the two grid systems this engine indexes with.

The reference ships both tilings (``bounds.py:176-372``) but leaves
cross-tiling transfer to the user; every real statistics pipeline needs
it (Morton cells are the lake's partition key, SSB cells are what
Statistics Norway publishes on).  Because BOTH tilings are axis-aligned
with integer-metre edges (res-r Morton cells are ``2^23 / 2^r`` m wide
on a domain anchored at multiples of 1000), the overlap geometry is
CLOSED FORM — no overlay join, no geometry kernel:

* work in domain-shifted coordinates ``sx = ix * cell_m`` (non-negative,
  so integer ``div`` IS floor division in both engines);
* a source cell spans at most ``ceil(cell_m / 1000) + 1`` grid columns
  and rows — a literal-bounded ``sequence`` explode (map-only);
* the per-(cell, target) share is
  ``count * wx * wy * 10^6 div cell_m^2`` — one exact truncating
  division per term, summed per target cell as plain BIGINTs.

Scale shape: histogram ``groupBy(ix, iy)`` (map-side combinable, the
ONLY data-sized shuffle) → ≤9-way explode of the tiny histogram → one
more combinable ``groupBy`` on the target key.  Overflow bound: the
intermediate is ``count * cell_m^2 * 10^6``; at res 13 (1024 m) counts
up to ~8.8e6 pages per cell fit int64 — beyond that, raise the
resolution (finer cells ⇒ smaller counts AND smaller cell_m²), which is
the right move for skew anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ssb_sgis_spark.cells import DOMAIN_SIZE, DOMAIN_X0, DOMAIN_Y0

__all__ = ["areal_interpolate_to_ssb", "areal_interpolate_to_ssb_sql"]


def _cell_m(res: int) -> int:
    cm = DOMAIN_SIZE / (1 << res)
    if cm != int(cm):
        raise ValueError(f"res {res} gives a non-integer cell size {cm}")
    return int(cm)


def areal_interpolate_to_ssb(
    df: DataFrame,
    res: int = 13,
    gridsize: int = 1000,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Count points per res-``res`` Morton cell, then spread each cell's
    count onto the SSB ``gridsize``-m grid by exact overlap fraction.
    Returns ``(SSBID, pages_micro)`` where ``pages_micro`` is the
    estimated count in integer micro-pages (each (cell, target) term
    floor-divided ONCE, then summed — order-free)."""
    cm, g = _cell_m(res), int(gridsize)
    if int(-DOMAIN_X0) % g or int(DOMAIN_Y0) % g:
        raise ValueError("domain anchor must sit on the SSB grid")
    # SSBID parts from shifted grid indices: real floor(x/g) = _cx + X0/g
    xoff = (2_000_000 + int(DOMAIN_X0)) // g  # false easting, grid units
    yoff = int(DOMAIN_Y0) // g
    n_cells = (1 << int(res))
    hist = (
        df.select(
            F.floor((F.col(x_col) - DOMAIN_X0) / cm).cast("long").alias("ix"),
            F.floor((F.col(y_col) - DOMAIN_Y0) / cm).cast("long").alias("iy"),
        )
        # out-of-domain points would give negative shifted coords, where
        # integer `div` truncation is no longer floor — drop them (the
        # Morton tiling doesn't cover them either); mirrored in the SQL
        .filter(
            (F.col("ix") >= 0) & (F.col("ix") < n_cells)
            & (F.col("iy") >= 0) & (F.col("iy") < n_cells)
        )
        .groupBy("ix", "iy")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return (
        hist.withColumn("sx0", F.expr(f"ix * {cm}"))
        .withColumn("sy0", F.expr(f"iy * {cm}"))
        .withColumn("_cx", F.explode(F.expr(f"sequence(sx0 div {g}, (sx0 + {cm - 1}) div {g})")))
        .withColumn("_cy", F.explode(F.expr(f"sequence(sy0 div {g}, (sy0 + {cm - 1}) div {g})")))
        .withColumn(
            "_s",
            F.expr(
                f"(cnt * (least(sx0 + {cm}, (_cx + 1) * {g}) - greatest(sx0, _cx * {g}))"
                f" * (least(sy0 + {cm}, (_cy + 1) * {g}) - greatest(sy0, _cy * {g}))"
                f" * 1000000) div {cm * cm}"
            ),
        )
        .select(
            F.concat(
                F.expr(f"CAST((_cx + {xoff}) * {g} AS STRING)"),
                F.expr(f"CAST((_cy + {yoff}) * {g} AS STRING)"),
            ).alias("SSBID"),
            F.col("_s"),
        )
        .groupBy("SSBID")
        .agg(F.sum("_s").cast("long").alias("pages_micro"))
    )


def areal_interpolate_to_ssb_sql(
    pages: str,
    res: int = 13,
    gridsize: int = 1000,
    x_col: str = "x",
    y_col: str = "y",
) -> str:
    """DuckDB mirror: identical cell histogram, scatter ranges, exact
    integer overlap shares and SSBID composition."""
    cm, g = _cell_m(res), int(gridsize)
    xoff = (2_000_000 + int(DOMAIN_X0)) // g
    yoff = int(DOMAIN_Y0) // g
    return f"""
    WITH pages AS ({pages}),
    hist AS (
      SELECT CAST(floor(({x_col} - ({DOMAIN_X0})) / {cm}) AS BIGINT) AS ix,
             CAST(floor(({y_col} - ({DOMAIN_Y0})) / {cm}) AS BIGINT) AS iy,
             CAST(count(*) AS BIGINT) AS cnt
      FROM pages
      WHERE floor(({x_col} - ({DOMAIN_X0})) / {cm}) >= 0
        AND floor(({x_col} - ({DOMAIN_X0})) / {cm}) < {1 << int(res)}
        AND floor(({y_col} - ({DOMAIN_Y0})) / {cm}) >= 0
        AND floor(({y_col} - ({DOMAIN_Y0})) / {cm}) < {1 << int(res)}
      GROUP BY 1, 2
    ),
    cells AS (SELECT cnt, ix * {cm} AS sx0, iy * {cm} AS sy0 FROM hist),
    scattered AS (
      SELECT cnt, sx0, sy0, cx, cy,
             (cnt * (least(sx0 + {cm}, (cx + 1) * {g}) - greatest(sx0, cx * {g}))
                  * (least(sy0 + {cm}, (cy + 1) * {g}) - greatest(sy0, cy * {g}))
                  * 1000000) // ({cm * cm}) AS s
      FROM cells,
           unnest(range(sx0 // {g}, (sx0 + {cm - 1}) // {g} + 1)) rx(cx),
           unnest(range(sy0 // {g}, (sy0 + {cm - 1}) // {g} + 1)) ry(cy)
    )
    SELECT concat(CAST((cx + {xoff}) * {g} AS VARCHAR),
                  CAST((cy + {yoff}) * {g} AS VARCHAR)) AS SSBID,
           CAST(sum(s) AS BIGINT) AS pages_micro
    FROM scattered GROUP BY 1
    """
