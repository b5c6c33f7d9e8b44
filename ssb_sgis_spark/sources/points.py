"""Deterministic point table derived from the customer table — the
"neighbors" side of kNN / nearest joins (models the reference's
``points_oslo`` fixture, ``tests/conftest.py:16-18``).

Same 31-bit LCG as sources/pages.py with a salt so the point cloud is
decorrelated from the page cloud; uniform over the municipality extent
(no hot spot — the skew lives on the page side).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pages import LCG_A, LCG_C, LCG_M

SALT = 777777
PT_X0, PT_Y0, PT_SPAN = 204000.0, 6564000.0, 152000.0


def points_sql(customer_rel: str = "customer") -> str:
    """DuckDB SQL producing (vid, px, py) — mirrored by points_df."""
    return f"""
    SELECT
      vid,
      {PT_X0} + (CAST(h1 AS DOUBLE) / {LCG_M}.0) * {PT_SPAN} AS px,
      {PT_Y0} + (CAST(h2 AS DOUBLE) / {LCG_M}.0) * {PT_SPAN} AS py
    FROM (
      SELECT vid, h1, (h1 * {LCG_A} + {LCG_C}) % {LCG_M} AS h2
      FROM (
        SELECT vid, ((vid + {SALT}) * {LCG_A} + {LCG_C}) % {LCG_M} AS h1
        FROM (SELECT c_custkey AS vid FROM {customer_rel})
      )
    )
    """


def points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = cust.select(F.col("c_custkey").cast("long").alias("vid"))
    df = df.withColumn("h1", ((F.col("vid") + SALT) * LCG_A + LCG_C) % LCG_M)
    df = df.withColumn("h2", (F.col("h1") * LCG_A + LCG_C) % LCG_M)
    return df.select(
        "vid",
        (PT_X0 + (F.col("h1").cast("double") / float(LCG_M)) * PT_SPAN).alias("px"),
        (PT_Y0 + (F.col("h2").cast("double") / float(LCG_M)) * PT_SPAN).alias("py"),
    )


def points_np(vids: np.ndarray):
    vids = vids.astype(np.int64)
    h1 = ((vids + SALT) * LCG_A + LCG_C) % LCG_M
    h2 = (h1 * LCG_A + LCG_C) % LCG_M
    px = PT_X0 + (h1.astype(np.float64) / float(LCG_M)) * PT_SPAN
    py = PT_Y0 + (h2.astype(np.float64) / float(LCG_M)) * PT_SPAN
    return px, py
