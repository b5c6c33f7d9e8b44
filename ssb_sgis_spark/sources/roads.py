"""Deterministic synthetic road network (grid graph) + SQL mirrors.

Models the reference's Oslo roads fixture (``io/read_parquet.py:41-54``,
93k lines) at test scale: an NX×NY lattice of nodes joined by unit-weight
segments.  The lattice makes graph queries *closed-form SQL-checkable*:
with every edge weight 1 the least cost between nodes is the Manhattan
index distance — so the REAL Dijkstra machinery (broadcast graph +
partitioned origins) is verified against exact arithmetic.

``broken=True`` removes every horizontal edge crossing ``BREAK_IX`` —
two components with closed-form labels for the CC query.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import wkb
from .pages import pages_sql

RX0, RY0 = 208000.0, 6568000.0
SPACING = 6000.0
NX, NY = 24, 24
BREAK_IX = 10  # broken=True removes horizontal edges (ix=9 -> ix=10)


def node_xy(ix: int, iy: int) -> tuple[float, float]:
    return RX0 + ix * SPACING, RY0 + iy * SPACING


def roads_df(spark: SparkSession, broken: bool = False) -> DataFrame:
    """(road_id long, oneway string, geometry WKB linestring) lattice."""
    rows = []
    rid = 0
    for iy in range(NY):
        for ix in range(NX - 1):
            if broken and ix + 1 == BREAK_IX:
                continue
            a = node_xy(ix, iy)
            b = node_xy(ix + 1, iy)
            rows.append(
                (rid, "B", bytearray(wkb.encode_linestring(np.array([a, b]))))
            )
            rid += 1
    for iy in range(NY - 1):
        for ix in range(NX):
            if broken and ix >= BREAK_IX:
                pass  # vertical edges exist on both sides of the break
            a = node_xy(ix, iy)
            b = node_xy(ix, iy + 1)
            rows.append(
                (rid, "B", bytearray(wkb.encode_linestring(np.array([a, b]))))
            )
            rid += 1
    # one partition: the lattice is tiny and the node-prep chain has
    # several Python stages — per-task worker startup dwarfs the work
    return spark.createDataFrame(
        rows, "road_id long, oneway string, geometry binary"
    ).coalesce(1)


def snap_to_node_cols(df: DataFrame, x_col: str = "x", y_col: str = "y"):
    """Nearest lattice node, native arithmetic: node_id = iy*NX + ix."""
    ix = F.least(
        F.greatest(F.round((F.col(x_col) - RX0) / SPACING, 0), F.lit(0.0)),
        F.lit(float(NX - 1)),
    ).cast("long")
    iy = F.least(
        F.greatest(F.round((F.col(y_col) - RY0) / SPACING, 0), F.lit(0.0)),
        F.lit(float(NY - 1)),
    ).cast("long")
    return ix, iy


def snap_sql(x: str, y: str) -> tuple[str, str]:
    ix = f"CAST(least(greatest(round(({x} - {RX0!r}) / {SPACING!r}, 0), 0.0), {NX - 1}.0) AS BIGINT)"
    iy = f"CAST(least(greatest(round(({y} - {RY0!r}) / {SPACING!r}, 0), 0.0), {NY - 1}.0) AS BIGINT)"
    return ix, iy


def origins_df(spark: SparkSession, sf_dir: str, mod: int) -> DataFrame:
    from .pages import pages_df

    p = pages_df(spark, sf_dir).filter(F.col("uid") % mod == 0)
    ix, iy = snap_to_node_cols(p)
    return p.select(
        F.col("uid").alias("origin"), (iy * NX + ix).alias("node_id")
    )


def origins_sql(mod: int, id_name: str = "origin") -> str:
    ix, iy = snap_sql("x", "y")
    return f"""
    SELECT uid AS {id_name}, ({iy}) * {NX} + ({ix}) AS node_id
    FROM ({pages_sql()}) WHERE uid % {mod} = 0
    """
