"""Deterministic box tables for the overlay driver queries.

``sites`` — one axis-aligned box per sampled page (the page's "site
footprint"); half-extents are pure integer arithmetic on uid so Spark and
DuckDB produce bit-identical doubles.  ``tiles`` — a regular grid over the
municipality extent (the make_grid output, ``bounds.py:176-259``).

Boxes are the SQL-checkable subclass of polygons: intersection /
area-of-intersection have closed forms (`least`/`greatest`), so the
*general* overlay engine (WKB + arrangement kernel) is verified against
exact SQL on them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .municipalities import MUNI_X0, MUNI_X1, MUNI_Y0, MUNI_Y1
from .pages import pages_df, pages_sql
from ..operators.grid import bounds_to_polygon

SITE_MOD = 7  # coprime with the hot-cluster mod 10 -> sites mix hot + uniform pages
TILE_SIZE = 8000.0


def site_bounds_cols(df: DataFrame) -> DataFrame:
    half_w = 100.0 + (F.col("uid") % 9).cast("double") * 150.0
    half_h = 100.0 + (F.col("uid") % 5).cast("double") * 210.0
    return df.select(
        "uid",
        (F.col("x") - half_w).alias("minx"),
        (F.col("y") - half_h).alias("miny"),
        (F.col("x") + half_w).alias("maxx"),
        (F.col("y") + half_h).alias("maxy"),
    )


def sites_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(uid, minx..maxy, geometry WKB) site boxes.  Bounds ride along as
    native columns (the engine's decode-once contract — with_bounds skips
    Python entirely when they are present)."""
    pages = pages_df(spark, sf_dir).filter(F.col("uid") % SITE_MOD == 0)
    return bounds_to_polygon(site_bounds_cols(pages))


def sites_bounds_sql() -> str:
    """DuckDB relation (uid, minx, miny, maxx, maxy) — bit-identical."""
    return f"""
    SELECT uid,
           x - (100.0 + CAST(uid % 9 AS DOUBLE) * 150.0) AS minx,
           y - (100.0 + CAST(uid % 5 AS DOUBLE) * 210.0) AS miny,
           x + (100.0 + CAST(uid % 9 AS DOUBLE) * 150.0) AS maxx,
           y + (100.0 + CAST(uid % 5 AS DOUBLE) * 210.0) AS maxy
    FROM ({pages_sql()}) WHERE uid % {SITE_MOD} = 0
    """


def _tile_counts() -> tuple[int, int]:
    import math

    nx = int(math.ceil((MUNI_X1 - MUNI_X0) / TILE_SIZE))
    ny = int(math.ceil((MUNI_Y1 - MUNI_Y0) / TILE_SIZE))
    return nx, ny


def tiles_df(spark: SparkSession) -> DataFrame:
    """(tile_id, geometry WKB) grid tiles over the municipality extent —
    the make_grid generated table."""
    nx, ny = _tile_counts()
    cells = (
        spark.range(nx * ny)
        .select(
            F.col("id").cast("long").alias("tile_id"),
            (F.col("id") % nx).cast("double").alias("ix"),
            F.floor(F.col("id") / nx).cast("double").alias("iy"),
        )
        .select(
            "tile_id",
            (F.lit(MUNI_X0) + F.col("ix") * TILE_SIZE).alias("minx"),
            (F.lit(MUNI_Y0) + F.col("iy") * TILE_SIZE).alias("miny"),
            (F.lit(MUNI_X0) + F.col("ix") * TILE_SIZE + TILE_SIZE).alias("maxx"),
            (F.lit(MUNI_Y0) + F.col("iy") * TILE_SIZE + TILE_SIZE).alias("maxy"),
        )
    )
    return bounds_to_polygon(cells)


def tiles_bounds_sql() -> str:
    nx, ny = _tile_counts()
    return f"""
    SELECT CAST(ix + iy * {nx} AS BIGINT) AS tile_id,
           {MUNI_X0!r} + CAST(ix AS DOUBLE) * {TILE_SIZE!r} AS minx,
           {MUNI_Y0!r} + CAST(iy AS DOUBLE) * {TILE_SIZE!r} AS miny,
           {MUNI_X0!r} + CAST(ix AS DOUBLE) * {TILE_SIZE!r} + {TILE_SIZE!r} AS maxx,
           {MUNI_Y0!r} + CAST(iy AS DOUBLE) * {TILE_SIZE!r} + {TILE_SIZE!r} AS maxy
    FROM (SELECT unnest(range(0, {nx})) AS ix), (SELECT unnest(range(0, {ny})) AS iy)
    """
