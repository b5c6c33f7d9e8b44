"""Temporal as-of join — for every left row, the most recent right row
at or before it (per key), without a range-explosion join.

The crawl-lake primitive Spark lacks natively: "which crawl snapshot of
this site was current when the event happened?"  Joining on
``l.ts >= r.ts`` directly plans a broadcast-nested-loop / range join
whose candidate set is quadratic in hot keys; pandas has ``merge_asof``
but only single-node.  This operator gets exact as-of semantics from
ONE shuffle:

1. union both sides (``unionByName`` with null-filled missing columns),
   tagging right rows ``_src = 0`` and left rows ``_src = 1``;
2. one window ``partitionBy(key).orderBy(ts, _src, tiebreak)`` with
   ``last(right_payload, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` — every left row
   reads the latest right row at or before its timestamp (``_src`` puts
   a right row *first* on timestamp ties, giving ``>=`` semantics, the
   same tie rule as DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``);
3. filter back to ``_src = 1``.

The right payload rides in ONE struct column, so a right row whose
payload legitimately contains nulls is still a complete match (a
per-column ``last(ignorenulls)`` would splice values from different
right rows).

Scale shape: the plan is exchange(key) + sort(key, ts) + running
window — identical cost to gap sessionization (``sessions.py``), linear
in rows, no candidate blow-up.  Hot keys colocate by construction; the
bound is per-key volume, which real crawl/event feeds bound by time
retention.  If a single key genuinely overflows one task, range-bucket
``ts`` into coarse epochs carrying forward each bucket's last right row
(one extra map pass) — documented, not needed at bench scale.

Oracle strategy: DuckDB executes its own native ``ASOF LEFT JOIN``
(a different algorithm entirely — sorted merge, not a running window),
so the cross-engine compare verifies semantics, not a shared
implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts_us",
    value_cols: list[str] | None = None,
    right_prefix: str = "",
) -> DataFrame:
    """As-of (backward) join: every ``left`` row gains the ``value_cols``
    of the latest ``right`` row with the same ``on`` key and
    ``right.ts <= left.ts`` (ties: the right row at exactly ``left.ts``
    wins).  Left rows with no prior right row keep NULL payload — the
    result has exactly ``len(left)`` rows.

    ``left`` and ``right`` must share the ``on`` and ``ts`` column
    names; ``value_cols`` defaults to every other right column.  Right
    rows tied on (key, ts) are broken by the first value column so the
    result is deterministic.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, ts)]
    out_names = [right_prefix + c for c in value_cols]
    clash = set(out_names) & set(left.columns)
    if clash:
        raise ValueError(f"right payload collides with left columns: {sorted(clash)}")

    payload = F.struct(*[F.col(c).alias(n) for c, n in zip(value_cols, out_names)])
    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_src"),
        payload.alias("_pay"),
        # deterministic order among right rows tied on (key, ts): the
        # row with the LARGEST first value column (native type order)
        # wins
        F.col(value_cols[0]).alias("_tie"),
    )
    l = left.select(
        *left.columns,
        F.lit(1).alias("_src"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(ts, "_src", F.col("_tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
    return matched.filter(F.col("_src") == 1).select(
        *left.columns, *[F.col("_m")[n].alias(n) for n in out_names]
    )
