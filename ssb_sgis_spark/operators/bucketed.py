"""Bucketed (pre-shuffled) tables — co-located joins with ZERO exchange.

The shuffle-engineering lever the north rule names alongside salting
and partition pruning: when two lake tables are written bucketed by the
join key with the same bucket count, Spark's sort-merge join reads
bucket i of each side into the same task — the join needs NO Exchange
on either side.  At 10^12 rows that converts every recurring
key-equi-join (pages⋈labels, corpus⋈scores, snapshots⋈snapshots) from
a full two-sided shuffle into a scan, once the write-side cost is paid
one time.

Implementation notes:
* bucketing rides Spark's catalog (``saveAsTable``) — plain
  ``parquet(path)`` writes cannot carry bucket metadata;
* ``sortBy`` on the bucket key additionally removes the per-task sort
  under the SortMergeJoin;
* the join side-condition: both tables bucketed by the join key with
  the SAME bucket count (or a divisor — Spark 3.1+ coalesces).

``tests/test_bucketed.py`` asserts the property this module exists for:
the joined plan contains no Exchange operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table", "plan_exchange_count"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed catalog table (overwrite)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        int(n_buckets), bucket_col
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_exchange_count(df: DataFrame) -> int:
    """Number of Exchange operators in the executed plan (0 for a
    properly co-located bucketed join)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )
