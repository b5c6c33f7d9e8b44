"""Skew-handling primitives: salted two-stage aggregation.

The north-rule scale story for hot keys (Oslo-dense tiles, boilerplate
band keys): a plain ``groupBy(key)`` shuffles every row of a hot key into
ONE reducer task.  For algebraic aggregates Spark's map-side partial
aggregation already bounds this, but aggregations without a map-side
combine (``collect_list``, ``collect_set``, exact ``count_distinct``)
funnel the full hot-key row set through one task.

``salted_agg`` runs those in two stages:

  stage 1: groupBy(key, salt = pmod(hash(row-id-ish), n_salts)) —
           the hot key's rows spread over ``n_salts`` reducers
  stage 2: groupBy(key) — combines the n_salts partials (rows now
           bounded by n_salts per key)

The caller provides per-column (partial, combine) aggregate pairs; the
built-ins cover the common cases.  Results are identical to the unsalted
aggregation for order-insensitive aggregates.

The per-cell skew histogram from the streaming layer
(``streaming/ingest.py``) tells you WHICH keys are hot and how many
salts bound the worst task; pass that as ``n_salts``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial aggregate over raw rows, combine aggregate over partials)
_BUILTINS = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "collect_set": (
        F.collect_set,
        lambda c: F.array_distinct(F.flatten(F.collect_list(c))),
    ),
    "collect_list": (
        F.collect_list,
        lambda c: F.flatten(F.collect_list(c)),
    ),
    "count_distinct": (
        F.collect_set,
        lambda c: F.size(F.array_distinct(F.flatten(F.collect_list(c)))).cast("long"),
    ),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 32,
    salt_col: Column | None = None,
) -> DataFrame:
    """Two-stage aggregation with a salt in stage 1.

    ``aggs`` maps output column name -> (input column, agg name from
    sum/count/min/max/collect_set/collect_list/count_distinct).
    ``salt_col`` defaults to a deterministic spread over every input
    column (xxhash64 of the whole row) — pass an explicit column when a
    cheaper row id exists.
    """
    if salt_col is None:
        salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    salted = df.withColumn("_salt", salt_col)

    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[
            _BUILTINS[a][0](col).alias(f"_p_{out}")
            for out, (col, a) in aggs.items()
        ]
    )
    return stage1.groupBy(*keys).agg(
        *[
            _BUILTINS[a][1](f"_p_{out}").alias(out)
            for out, (col, a) in aggs.items()
        ]
    )
