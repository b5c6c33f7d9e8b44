"""Interval-overlap join — chunk-bucketed, the range-join scale shape.

``SELECT * FROM points p JOIN intervals i ON p.t >= i.s AND p.t < i.e``
has NO equi-key, so Catalyst plans a BroadcastNestedLoopJoin (or a
cartesian) — O(|p|·|i|) comparisons, fine only while one side
broadcasts.  Campaign-attribution, maintenance-window and ad-slot joins
at web scale have BOTH sides big; the standard fix (the same one
Databricks' range-join hints and DuckDB's IEJoin replace) is to
manufacture the equi-key: quantize time into fixed ``chunk``-width
buckets, explode every interval to the buckets it overlaps, tag every
point with its single bucket, hash-join on the bucket, and re-check the
exact predicate on the ~constant-size candidate set.

Cost model: each point lands in EXACTLY one bucket (no point dedup
needed — a (point, interval) pair can only meet in the point's bucket);
each interval emits ``ceil(len / chunk) + 1`` rows, so pick ``chunk``
near the median interval length to keep the fan-out ~2.  Skew: a bucket
where many intervals and many points coincide is an ordinary hot hash
key — AQE's skew-split handles it (the join is a plain shuffled hash
join on the bucket), and a pathological month-long interval fans out to
``month/chunk`` rows, linear and bounded, never quadratic.

Intervals are half-open ``[s, e)``; rows with ``e <= s`` (empty) are
dropped (Spark's ``sequence(a, b)`` DESCENDS when ``b < a`` — without
the guard an inverted interval would silently explode to a reversed
bucket range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str,
    start_col: str,
    end_col: str,
    chunk: int,
) -> DataFrame:
    """All (point, interval) rows with ``start <= t < end`` (half-open),
    as an EQUI-join on the time bucket — never a nested loop.  ``t``,
    ``start``, ``end`` are integers in the same unit; ``chunk`` is the
    bucket width in that unit."""
    ch = int(chunk)
    if ch <= 0:
        raise ValueError("chunk must be a positive integer")
    pc = points.withColumn("_ch", F.expr(f"{t_col} div {ch}"))
    ic = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "_ch",
            F.explode(
                F.sequence(
                    F.expr(f"{start_col} div {ch}"),
                    F.expr(f"({end_col} - 1) div {ch}"),
                )
            ),
        )
    )
    return (
        pc.join(ic, "_ch")
        .filter(
            (F.col(t_col) >= F.col(start_col)) & (F.col(t_col) < F.col(end_col))
        )
        .drop("_ch")
    )
