"""Streaming sessionization: native ``session_window`` over an event
stream, parity-tested against the batch operator.

Spark's ``session_window(ts, gap)`` merges events into gap-bounded
sessions inside the streaming state store — the same session definition
as the batch ``operators/sessions.py`` window (a new session opens when
the gap since the previous event exceeds the threshold), so a session's
(start, end, event count) must agree between an availableNow streaming
run and the batch operator over the same files.  That equivalence is the
module's test (stream ≡ batch), the same pattern as streaming/ingest.py.

Scale shape: state is keyed by (user, open session) and evicted by the
watermark once a session can no longer grow — memory follows ACTIVE
sessions, not history.  The output is append-mode (sessions emit when
finalized), which is exactly the lake-manifest ingestion model.

Caveat vs batch: streaming session_window keys sessions by their
(merged) time range, so the per-user ordinal ``session_id`` of the
batch operator is replaced by ``session_start`` — stable, join-friendly,
and watermark-safe (an ordinal would require total per-user history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["session_rollup_stream"]


def session_rollup_stream(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked per-session rollup of an event stream:
    ``(user, session_start, session_end, n_events)``."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(stream.schema[ts_col].dataType, TimestampNTZType):
        # watermarks require TIMESTAMP; convert NTZ wall time to the
        # same UTC wall time regardless of the session timezone.  The
        # cast interprets the wall time in the session tz (instant
        # shifts by -offset); from_utc_timestamp with the same tz adds
        # the offset back — the exact inverse (to_utc_timestamp would
        # DOUBLE the shift on any non-UTC host).
        stream = stream.withColumn(
            ts_col,
            F.from_utc_timestamp(
                F.col(ts_col).cast("timestamp"), F.expr("current_timezone()")
            ),
        )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
