"""Events-table access point.

One indirection so the bench harness can reroute the sessionization /
retention / as-of profiles onto a MATERIALIZED scaled events table
(``SPARK_GRAFT_EVENTS_PARQUET``) the same way the page and document
profiles work — the lake-table model: both scaling levels read the same
files, scan parallelism follows cores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["events_df"]


def events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")
