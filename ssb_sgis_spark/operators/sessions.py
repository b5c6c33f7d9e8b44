"""Gap-based sessionization over event streams.

The web-analytics primitive the ``events`` table exists for: group a
user's events into sessions separated by inactivity gaps, label every
event, and aggregate per session.  Batch twin of the streaming layer's
watermarked rollups (``streaming/ingest.py``).

Exactness: all comparisons and outputs are 64-bit integers — timestamps
as epoch MICROSECONDS via a timezone-free diff against the epoch
(``timestampdiff(MICROSECOND, ...)`` on TIMESTAMP_NTZ ≡ DuckDB
``date_diff('microsecond', ...)`` on naive TIMESTAMP — neither engine
applies a session timezone), the gap in
microseconds, session ids as per-user ordinals, money as integer cents
via ``floor(value * 100 + 0.5)`` (multiplication and floor are exact
IEEE double ops, so both engines agree bit-for-bit; a float SUM would
depend on aggregation order).

Scale shape: ONE window spec — ``partition by user order by (ts, id)``
— shared by the lag and the running sum, so Spark plans a single
shuffle on user_id + one sort per partition; the per-session aggregate
then groups by (user, session), a subset-key shuffle AQE can often
coalesce.  Sessions are inherently sequential per user, so per-user
data must meet in one place — the skew story is that real event streams
bound per-user volume (a user emits O(10^3) events/day), not salting;
a pathological single-user firehose is a data bug, not a plan bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sessionize",
    "session_stats",
    "session_stats_sql",
    "cohort_retention",
    "cohort_retention_sql",
    "rolling_rate",
    "rolling_rate_sql",
]

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # 30 minutes
WEEK_US = 7 * 24 * 3600 * 1_000_000


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_us: int = DEFAULT_GAP_US,
) -> DataFrame:
    """Append ``ts_us`` (epoch micros) and ``session_id`` (per-user
    ordinal starting at 1; a new session opens when the gap since the
    user's previous event exceeds ``gap_us``)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    ts_us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {ts_col})"
    )
    new_sess = (
        F.when(
            ts_us - F.lag(ts_us).over(w) > F.lit(int(gap_us)), F.lit(1)
        ).otherwise(F.lit(0))
    )
    return df.withColumn("ts_us", ts_us).withColumn(
        "session_id", (F.sum(new_sess).over(w) + 1).cast("long")
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_us: int = DEFAULT_GAP_US,
) -> DataFrame:
    """Per-session aggregate: start/end (epoch micros), event count and
    integer-cent value sum."""
    s = sessionize(df, user_col, ts_col, id_col, gap_us)
    cents = F.floor(F.col(value_col) * 100 + 0.5).cast("long")
    return (
        s.groupBy(user_col, "session_id")
        .agg(
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.count("*").alias("n_events"),
            F.sum(cents).alias("value_cents"),
        )
    )


def session_stats_sql(
    rel: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_us: int = DEFAULT_GAP_US,
) -> str:
    """DuckDB mirror: same lag/running-sum windows over the same total
    order, same integer arithmetic."""
    return f"""
    WITH ev AS (
        SELECT {user_col}, {id_col}, {value_col},
               date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00',
                         {ts_col}) AS ts_us
        FROM {rel}
    ),
    flagged AS (
        SELECT *,
               CASE WHEN ts_us - lag(ts_us) OVER w > {int(gap_us)}
                    THEN 1 ELSE 0 END AS new_sess
        FROM ev
        WINDOW w AS (PARTITION BY {user_col} ORDER BY ts_us, {id_col})
    ),
    labeled AS (
        SELECT *,
               CAST(sum(new_sess) OVER w + 1 AS BIGINT) AS session_id
        FROM flagged
        WINDOW w AS (PARTITION BY {user_col} ORDER BY ts_us, {id_col}
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT {user_col}, session_id,
           min(ts_us) AS start_us,
           max(ts_us) AS end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor({value_col} * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM labeled
    GROUP BY {user_col}, session_id
    """


# ------------------------------------------------------ cohort retention
def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    week_us: int = WEEK_US,
) -> DataFrame:
    """Weekly cohort-retention triangle: users are cohorted by the epoch
    week of their FIRST event; ``n_users`` counts how many of a cohort
    were active again ``week_offset`` weeks later (offset 0 is the
    cohort size).  The classic product-analytics rollup over the events
    table.

    Exactness: weeks are integer epoch-week ordinals (the same tz-free
    microsecond diff as :func:`sessionize`, floor-divided), so every
    output is 64-bit integer and order-free.

    Scale shape: one DISTINCT (user, week) shuffle — the only pass over
    raw events; the first-week agg and the final (cohort, offset)
    rollup both re-aggregate that deduped set with map-side combine;
    the cohort join is an equi-join on the user key.  At 10^12 events
    the distinct set is bounded by users x active-weeks, orders of
    magnitude below the event count.
    """
    ts_us = (
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {ts_col})"
    )
    # integer `div` — DuckDB's `//` on BIGINTs is integer division too;
    # a float `/` + cast would round through double
    weeks = df.select(
        F.col(user_col).alias("_u"),
        F.expr(f"({ts_us}) div {int(week_us)}").cast("long").alias("_wk"),
    ).distinct()
    firsts = weeks.groupBy("_u").agg(F.min("_wk").alias("cohort_week"))
    return (
        weeks.join(firsts, "_u")
        .groupBy(
            "cohort_week",
            (F.col("_wk") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def cohort_retention_sql(
    rel: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    week_us: int = WEEK_US,
) -> str:
    """DuckDB mirror: same tz-free week ordinal, same dedup-then-rollup."""
    return f"""
    WITH wk AS (
        SELECT DISTINCT {user_col} AS u,
               date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00',
                         {ts_col}) // {int(week_us)} AS wk
        FROM {rel}
    ),
    f AS (SELECT u, min(wk) AS cohort_week FROM wk GROUP BY 1)
    SELECT CAST(f.cohort_week AS BIGINT) AS cohort_week,
           CAST(wk.wk - f.cohort_week AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM wk JOIN f USING (u)
    GROUP BY 1, 2
    """


# ------------------------------------------------------- trailing-rate burst
HOUR_US = 3600 * 1_000_000


def rolling_rate(
    df: DataFrame,
    window_us: int = HOUR_US,
    burst_threshold: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event trailing-window activity rate — the burst/abuse
    detector (crawler politeness, scraper storms): for every event, how
    many of the SAME user's events landed in ``[ts - window_us, ts]``,
    flagged when the count crosses ``burst_threshold``.

    Exactness: a RANGE frame over integer epoch microseconds — frame
    bounds and counts are exact in both engines, and RANGE (not ROWS)
    makes timestamp ties frame-inclusive on both sides, so the result
    is order-free.

    Scale shape: ONE shuffle on the user key + a per-partition sort —
    the same exchange sessionization uses; the running range frame is
    evaluated with a sliding two-pointer over each sorted partition
    (linear, no per-row rescan).
    """
    ts_us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {ts_col})"
    ).cast("long")
    w = (
        Window.partitionBy(user_col)
        .orderBy("ts_us")
        .rangeBetween(-int(window_us), 0)
    )
    return (
        df.select(F.col(id_col), F.col(user_col), ts_us.alias("ts_us"))
        .withColumn("n_trailing", F.count("*").over(w).cast("long"))
        .withColumn(
            "burst", (F.col("n_trailing") >= int(burst_threshold)).cast("long")
        )
    )


def rolling_rate_sql(
    rel: str,
    window_us: int = HOUR_US,
    burst_threshold: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """DuckDB mirror: same integer-microsecond RANGE frame."""
    return f"""
    WITH e AS (
        SELECT {id_col}, {user_col},
               date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00',
                         {ts_col}) AS ts_us
        FROM {rel}
    )
    SELECT {id_col}, {user_col}, ts_us,
           CAST(count(*) OVER (
               PARTITION BY {user_col} ORDER BY ts_us
               RANGE BETWEEN {int(window_us)} PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_trailing,
           CAST(count(*) OVER (
               PARTITION BY {user_col} ORDER BY ts_us
               RANGE BETWEEN {int(window_us)} PRECEDING AND CURRENT ROW
           ) >= {int(burst_threshold)} AS BIGINT) AS burst
    FROM e
    """
