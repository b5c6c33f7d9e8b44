"""Ordered event-funnel analysis — how many users completed step 1,
then step 2 AFTER step 1, then step 3 after step 2 (within a conversion
window): the product-analytics primitive next to sessionization
(``sessions.py``) and cohort retention.

Semantics (the standard "first touch" funnel): per user,
``t1 = min ts(step1)``; ``t_k = min ts(step_k with ts > t_{k-1})``; the
final step must also land within ``window_us`` of ``t1``.  A user
counts for step k iff ``t_k`` exists — later steps are by construction
a subset of earlier ones.

Exactness: timestamps are the engine's tz-free epoch microseconds, all
comparisons integer, counts 64-bit — bit-identical to the SQL mirror.

Scale shape: ONE shuffle.  Every ``t_k`` is a conditional-min window
over the same ``partitionBy(user)`` spec, so Spark plans a single
exchange + sort followed by chained Window operators (each reads the
previous one's output in place — partitioning is preserved, no second
exchange; the same reuse discipline as ``sessionize``'s shared window).
The per-user collapse and the 3-row reshape are combinable aggregates
of that output.  NULL propagation does the step gating: while
``t_{k-1}`` is NULL, ``ts > t_{k-1}`` is NULL and the candidate is
excluded — identical three-valued logic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["funnel_counts", "funnel_counts_sql"]

DEFAULT_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # one week


def funnel_counts(
    df: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    window_us: int = DEFAULT_WINDOW_US,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """``(step, n_users)`` — one row per funnel step (1-based), counting
    users whose first-touch chain reached that step, the whole chain
    inside ``window_us``."""
    ts_us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {ts_col})"
    ).cast("long")
    e = df.select(F.col(user_col).alias("_u"), F.col(type_col).alias("_ty"),
                  ts_us.alias("_ts"))
    w = Window.partitionBy("_u")
    for i, step in enumerate(steps, start=1):
        cond = F.col("_ty") == step
        if i > 1:
            cond = cond & (F.col("_ts") > F.col(f"_t{i - 1}"))
        if i == len(steps) and i > 1:
            cond = cond & (F.col("_ts") - F.col("_t1") <= int(window_us))
        e = e.withColumn(f"_t{i}", F.min(F.when(cond, F.col("_ts"))).over(w))
    per_user = e.groupBy("_u").agg(
        *[F.min(f"_t{i}").alias(f"_t{i}") for i in range(1, len(steps) + 1)]
    )
    stack = ", ".join(
        f"CAST({i} AS BIGINT), CAST(count(_t{i}) AS BIGINT)"
        for i in range(1, len(steps) + 1)
    )
    return per_user.agg(
        *[F.count(f"_t{i}").alias(f"_c{i}") for i in range(1, len(steps) + 1)]
    ).selectExpr(
        "stack("
        + str(len(steps))
        + ", "
        + ", ".join(
            f"CAST({i} AS BIGINT), CAST(_c{i} AS BIGINT)"
            for i in range(1, len(steps) + 1)
        )
        + ") AS (step, n_users)"
    )


def funnel_counts_sql(
    rel: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    window_us: int = DEFAULT_WINDOW_US,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """DuckDB mirror: the same chained conditional-min windows, the same
    NULL gating, counts unioned per step."""
    ctes = [
        f"""e0 AS (
      SELECT {user_col} AS u, {type_col} AS ty,
             date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00',
                       {ts_col}) AS ts
      FROM {rel}
    )"""
    ]
    for i, step in enumerate(steps, start=1):
        cond = f"ty = '{step}'"
        if i > 1:
            cond += f" AND ts > t{i - 1}"
        if i == len(steps) and i > 1:
            cond += f" AND ts - t1 <= {int(window_us)}"
        ctes.append(
            f"e{i} AS (SELECT *, min(CASE WHEN {cond} THEN ts END) "
            f"OVER (PARTITION BY u) AS t{i} FROM e{i - 1})"
        )
    n = len(steps)
    mins = ", ".join(f"min(t{i}) AS t{i}" for i in range(1, n + 1))
    unions = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, CAST(count(t{i}) AS BIGINT) AS n_users FROM pu"
        for i in range(1, n + 1)
    )
    return f"""
    WITH {','.join(ctes)},
    pu AS (SELECT u, {mins} FROM e{n} GROUP BY u)
    {unions}
    """
