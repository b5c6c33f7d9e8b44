"""Adaptive recrawl scheduling — change-rate estimation per URL.

A crawler that refetches everything at the same cadence wastes most of
its budget: news front pages change hourly, documentation pages change
yearly.  The classic fix (Cho & Garcia-Molina's change-frequency work,
made operational in every production crawler) is to estimate each
URL's change rate from its OWN fetch history — the sequence of
(fetch_ts, content digest) pairs the crawl log already contains — and
derive the next refetch interval from it.

:func:`estimate_change_rates` consumes the history table and emits one
row per URL:

* ``n_intervals`` — consecutive fetch pairs observed,
* ``n_changes`` — pairs whose digests differ,
* ``mean_interval_s`` — observed mean spacing (integer seconds, exact
  ``div``),
* ``bucket`` — the recrawl class by integer cross-multiplied ratio
  thresholds (no float division, the engine's house rule):
  ``hot`` (changes ≥ 3/4 of intervals), ``warm`` (≥ 1/4), ``cold``
  (> 0), ``frozen`` (never changed),
* ``next_fetch_s`` — the next interval: mean spacing halved for hot,
  kept for warm, doubled for cold, quadrupled for frozen (the standard
  multiplicative adapt-up/adapt-down policy, exact integers).

Plan shape at 10^12 history rows: one url-keyed exchange feeds BOTH
the lag-window (change detection between consecutive fetches) and the
per-url aggregate — Catalyst reuses the partitioning, so the history
shuffles once; digests travel as 64-bit hashes, content never moves.
This is the same one-key-shuffle shape as operators/sessions.py.

Synthetic law: :func:`fetch_history_df` gives every page ``n_fetches``
daily fetches whose digest seed advances every ``m = 1 + uid % 7``
fetches — so a page with m=1 changes every day (hot), m=5 changes
once (cold), and m≥6 never changes (frozen), all derivable by uid
arithmetic.  The driver oracle
computes every output column CLOSED-FORM from uid (it never compares
a digest pair); the pytest law test cross-checks the window pipeline
against the same arithmetic.

Reference parity: none — webtext surface (BASELINE input_hint); the
estimator policy is the public Cho & Garcia-Molina / Nutch
AdaptiveFetchSchedule shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fetch_history_df", "estimate_change_rates"]


def estimate_change_rates(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    digest_col: str = "digest",
) -> DataFrame:
    """Per-URL change statistics + adaptive next-fetch interval from a
    (url, fetch_ts, digest) history.  One url-keyed shuffle total."""
    w = Window.partitionBy("url").orderBy("_ts")
    lagged = history.select(
        F.col(url_col).alias("url"),
        F.unix_timestamp(F.col(ts_col)).alias("_ts"),
        F.xxhash64(F.col(digest_col)).alias("_dig"),
    ).select(
        "url",
        "_ts",
        "_dig",
        F.lag("_ts").over(w).alias("_pts"),
        F.lag("_dig").over(w).alias("_pdig"),
    )
    agg = lagged.groupBy("url").agg(
        F.count("_pts").alias("n_intervals"),
        F.sum(
            F.when(F.col("_pts").isNotNull() & (F.col("_dig") != F.col("_pdig")), 1)
            .otherwise(0)
        ).alias("n_changes"),
        (F.max("_ts") - F.min("_ts")).alias("_span"),
    )
    n, x = F.col("n_intervals"), F.col("n_changes")
    # exact floor division (Spark double-cast truncates, DuckDB's
    # bigint cast ROUNDS — floor is the cross-engine-stable form)
    mean_s = F.when(n > 0, F.floor(F.col("_span") / n)).otherwise(F.lit(None))
    bucket = (
        F.when(n == 0, F.lit(None))
        .when(x * 4 >= n * 3, F.lit("hot"))
        .when(x * 4 >= n, F.lit("warm"))
        .when(x > 0, F.lit("cold"))
        .otherwise(F.lit("frozen"))
    )
    factor_num, factor_den = (
        F.when(x * 4 >= n * 3, F.lit(1)).when(x * 4 >= n, F.lit(1))
        .when(x > 0, F.lit(2)).otherwise(F.lit(4)),
        F.when(x * 4 >= n * 3, F.lit(2)).otherwise(F.lit(1)),
    )
    return agg.select(
        "url",
        "n_intervals",
        "n_changes",
        mean_s.alias("mean_interval_s"),
        bucket.alias("bucket"),
        F.when(n > 0, F.floor(mean_s * factor_num / factor_den))
        .otherwise(F.lit(None))
        .alias("next_fetch_s"),
    )


def fetch_history_df(
    pages: DataFrame, n_fetches: int = 6, period_s: int = 86400
) -> DataFrame:
    """Law history: daily fetches whose digest seed advances every
    ``m = 1 + uid % 7`` fetches (native exprs only) — m of 6 or 7
    never changes within the 6-fetch window, covering the frozen
    bucket."""
    m = (F.lit(1) + F.col("uid") % 7).cast("long")
    f = F.explode(F.sequence(F.lit(0), F.lit(n_fetches - 1))).alias("f")
    rows = pages.select("uid", "url", m.alias("m"), f)
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.col("uid") % 3600
        + F.col("f") * period_s
    )
    digest = F.concat(
        F.lit("d-"),
        F.col("uid").cast("string"),
        F.lit("-"),
        F.floor(F.col("f") / F.col("m")).cast("string"),
    )
    return rows.select("url", ts.alias("fetch_ts"), digest.alias("digest"))
