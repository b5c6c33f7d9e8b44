"""SCD Type-2 dimension history — the slowly-changing-dimension merge.

The lake layer (``sources/snapshots.py``) gives MERGE-INTO upserts that
OVERWRITE a row's previous value; an analytics lake also needs the
warehouse-grade alternative that PRESERVES it: Kimball's Type-2 rule,
where an update closes the current version (``valid_to = ts``) and
appends a new open version (``valid_from = ts, valid_to = NULL``).
Crawl-pipeline reading: the URL/domain metadata history table that lets
"what did we believe about this host when the March corpus was cut?" be
answered with one ``valid_from <= T < valid_to`` predicate.

Exactness: the change predicate is a column-wise ``<=>`` (null-safe
equality) comparison — no hashing, no floats beyond what the attribute
columns already carry — and versions are stamped with the integer
``ts`` the caller supplies, so both engines produce the identical
history bit for bit.

Scale shape: ONE equi-join of the update batch against the current
(open) slice on the business key decides everything; closed history
rows pass through untouched (union, no join), so per-merge cost follows
the UPDATE batch + open slice, never the accumulated history.  No-op
updates (all attributes unchanged) are detected in the join and leave
the dimension untouched — the guard that keeps a daily full-feed from
doubling the table every day.

Reference note: sgis has no warehouse layer; this extends the engine's
lake family (``sources/snapshots.py`` merge/optimize/tags) with the
history-preserving merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_apply", "scd2_apply_sql"]


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts: int,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension at integer time ``ts``.

    ``dim`` columns: ``key``, ``attrs...``, ``valid_from``, ``valid_to``
    (NULL = open).  ``updates`` columns: ``key``, ``attrs...``.  Returns
    the merged dimension:

    * closed rows pass through untouched (no join);
    * open rows with NO update, or whose update carries identical
      attributes (null-safe), pass through unchanged;
    * open rows with a CHANGED update are closed at ``ts`` and a new
      open version with the update's attributes is appended;
    * brand-new keys insert as open versions.

    Precondition (the SCD2 invariant): at most one open row per key and
    at most one update row per key — enforced upstream by the lake
    MERGE's cardinality guard pattern.
    """
    open_rows = dim.filter(F.col(valid_to).isNull())
    closed_rows = dim.filter(F.col(valid_to).isNotNull())

    # the update side carries an explicit marker: a row of all-NULL
    # update attrs for an existing key is still "an update present",
    # which attr nullability alone could not distinguish
    upd_marked = updates.select(
        F.col(key), F.lit(1).alias("_has_upd"),
        *[F.col(a).alias(f"_u_{a}") for a in attrs],
    )
    j = open_rows.join(upd_marked, key, "full_outer")
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.col(f"_u_{a}"))
    has_open = F.col(valid_from).isNotNull()

    unchanged_open = j.filter(
        has_open & (F.col("_has_upd").isNull() | ~changed)
    ).select(key, *attrs, valid_from, valid_to)
    to_close = j.filter(
        has_open & F.col("_has_upd").isNotNull() & changed
    ).select(
        key, *attrs, valid_from,
        F.lit(int(ts)).cast("long").alias(valid_to),
    )
    new_versions = j.filter(
        F.col("_has_upd").isNotNull() & (~has_open | changed)
    ).select(
        key,
        *[F.col(f"_u_{a}").alias(a) for a in attrs],
        F.lit(int(ts)).cast("long").alias(valid_from),
        F.lit(None).cast("long").alias(valid_to),
    )
    return (
        closed_rows.select(key, *attrs, valid_from, valid_to)
        .unionByName(unchanged_open)
        .unionByName(to_close)
        .unionByName(new_versions)
    )


def scd2_apply_sql(
    dim_sql: str,
    updates_sql: str,
    key: str,
    attrs: list[str],
    ts: int,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> str:
    """DuckDB mirror of :func:`scd2_apply` (same join/predicate rule)."""
    a_cols = ", ".join(attrs)
    changed = " OR ".join(
        f"(NOT (j.{a} IS NOT DISTINCT FROM j._u_{a}))" for a in attrs
    )
    return f"""
    WITH dim AS ({dim_sql}),
    upd AS (SELECT {key}, 1 AS _has_upd,
                   {", ".join(f"{a} AS _u_{a}" for a in attrs)}
            FROM ({updates_sql})),
    openr AS (SELECT * FROM dim WHERE {valid_to} IS NULL),
    closedr AS (SELECT {key}, {a_cols}, {valid_from}, {valid_to}
                FROM dim WHERE {valid_to} IS NOT NULL),
    j AS (
      SELECT coalesce(o.{key}, u.{key}) AS {key},
             {", ".join(f"o.{a} AS {a}" for a in attrs)},
             o.{valid_from} AS {valid_from},
             o.{valid_to} AS {valid_to},
             u._has_upd,
             {", ".join(f"u._u_{a}" for a in attrs)}
      FROM openr o FULL OUTER JOIN upd u ON o.{key} = u.{key}
    ),
    j2 AS (
      SELECT j.*,
             CASE WHEN {changed} THEN 1 ELSE 0 END AS _chg
      FROM j
    )
    SELECT {key}, {a_cols}, {valid_from}, {valid_to} FROM closedr
    UNION ALL
    SELECT {key}, {a_cols}, {valid_from}, CAST(NULL AS BIGINT) AS {valid_to}
    FROM j2 WHERE {valid_from} IS NOT NULL AND (_has_upd IS NULL OR _chg = 0)
    UNION ALL
    SELECT {key}, {a_cols}, {valid_from}, CAST({int(ts)} AS BIGINT) AS {valid_to}
    FROM j2 WHERE {valid_from} IS NOT NULL AND _has_upd = 1 AND _chg = 1
    UNION ALL
    SELECT {key}, {", ".join(f"_u_{a} AS {a}" for a in attrs)},
           CAST({int(ts)} AS BIGINT) AS {valid_from},
           CAST(NULL AS BIGINT) AS {valid_to}
    FROM j2 WHERE _has_upd = 1 AND ({valid_from} IS NULL OR _chg = 1)
    """
