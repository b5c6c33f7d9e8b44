"""Per-domain crawl-budget operators: skew-safe top-K and recrawl-latest.

Every large web-corpus pipeline caps how many pages one registered
domain may contribute (per-domain caps in C4/Gopher/Dolma-style curation)
and, when the crawl contains several snapshots of the same page, keeps
only the newest one.  Both are one logical rule — "top-K rows per key by
a sort order" — and both hit the same scale hazard: a single hot domain
(link farms, big portals) can hold 10^8 of the 10^12 rows, so a naive
``row_number() OVER (PARTITION BY domain)`` sends one domain to one
reducer task.

``per_key_topk`` therefore runs the classic two-stage refinement:

1. **Salted partial top-K** — every row gets ``salt = pmod(xxhash64(id),
   nsalts)``; a window over ``(key, salt)`` keeps K rows per salted
   group.  The shuffle key has ``nsalts`` times the cardinality, so the
   hot domain spreads over ``nsalts`` reducers, and at most ``K *
   nsalts`` rows per domain survive — a hard bound independent of the
   domain's input size.
2. **Exact final top-K** — a second window over ``key`` alone on the
   (tiny) survivor set.  Correct because the global top-K of a union is
   contained in the union of per-part top-Ks.

Total cost: one balanced full shuffle + one shuffle of ≤ K*nsalts rows
per key.  The sort order must be TOTAL (break ties on a unique id) or
"top-K" is not well defined row-wise; callers pass explicit tie-breaks
and the DuckDB oracle mirrors them verbatim.

Reference parity note: the reference has no crawl-budget layer (it is a
GIS toolkit); these operators belong to the north rule's web-corpus
side (BASELINE.json input_hint: pages keyed by url with warc_ts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["per_key_topk", "per_domain_latest", "crawl_delta", "crawl_delta_sql"]


def per_key_topk(
    df: DataFrame,
    key: Column | str,
    order_by: list[Column],
    k: int,
    tie_id: Column | str,
    nsalts: int = 32,
) -> DataFrame:
    """Keep the first ``k`` rows of every ``key`` group under
    ``order_by`` (descending ordering must be expressed by the caller
    via ``F.desc(...)``), skew-safe via salted two-stage windows.

    ``order_by`` must totally order rows within a key — include
    ``tie_id`` (a unique row id) as the last sort column.  ``tie_id``
    also seeds the salt, so salting is deterministic.
    """
    key = F.col(key) if isinstance(key, str) else key
    tie_id = F.col(tie_id) if isinstance(tie_id, str) else tie_id
    # temp names that cannot clobber caller columns (e.g. a frame that
    # already carries _salt/_rn from another salted operator)
    salt_c, rn_c = "__pkt_salt", "__pkt_rn"
    for c in (salt_c, rn_c):
        if c in df.columns:
            raise ValueError(f"input frame already has a column named {c!r}")
    if nsalts > 1:
        salted = df.withColumn(salt_c, F.pmod(F.xxhash64(tie_id), F.lit(nsalts)))
        w1 = Window.partitionBy(key, F.col(salt_c)).orderBy(*order_by)
        partial = (
            salted.withColumn(rn_c, F.row_number().over(w1))
            .filter(F.col(rn_c) <= k)
            .drop(rn_c, salt_c)
        )
    else:
        partial = df
    w2 = Window.partitionBy(key).orderBy(*order_by)
    return (
        partial.withColumn(rn_c, F.row_number().over(w2))
        .filter(F.col(rn_c) <= k)
        .drop(rn_c)
    )


def per_domain_latest(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "uid",
    k: int = 1,
    domain_out: str = "domain",
    nsalts: int = 32,
) -> DataFrame:
    """Newest ``k`` snapshots per registered domain: the recrawl-dedup /
    per-domain-cap rule over the input_hint pages shape.

    Ordering is (ts DESC, id DESC) — total, so the result is unique and
    bit-comparable against the SQL ``QUALIFY row_number()`` mirror.
    """
    from ..functions.url import domain_col

    out = df.withColumn(domain_out, domain_col(F.col(url_col)))
    return per_key_topk(
        out,
        key=domain_out,
        order_by=[F.desc(ts_col), F.desc(id_col)],
        k=k,
        tie_id=id_col,
        nsalts=nsalts,
    )


# ------------------------------------------------------- recrawl snapshot diff
def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    content_cols: tuple[str, ...] = ("content",),
) -> DataFrame:
    """Diff two crawl snapshots: ``(key_col, change)`` with change in
    {'added', 'removed', 'changed'} — unchanged pages are dropped (at
    recrawl scale the overwhelmingly common case, so the output is the
    small side).

    One full-outer equi-join on the key; content equality is an md5 over
    the stringified content columns computed map-side on EACH input, so
    the join carries (key, 32-byte digest) — never page payloads.  At
    10^12 rows both sides shuffle once on the key; pre-bucketed lake
    tables would co-locate it.

    NULL-safe: each column is encoded as ``'v' + value`` or the bare
    ``'n'`` before hashing — a plain concat_ws would SKIP nulls, making
    NULL ≡ '' and letting null-shifted tuples collide.
    """
    parts = [
        F.coalesce(
            F.concat(F.lit("v"), F.col(c).cast("string")), F.lit("n")
        )
        for c in content_cols
    ]
    digest = F.md5(F.concat_ws("\x1f", *parts))

    o = old.select(F.col(key_col).alias("k"), digest.alias("oh"))
    n = new.select(F.col(key_col).alias("k"), digest.alias("nh"))
    j = o.join(n, "k", "full_outer")
    return (
        j.select(
            F.col("k").alias(key_col),
            F.when(F.col("oh").isNull(), F.lit("added"))
            .when(F.col("nh").isNull(), F.lit("removed"))
            .when(F.col("oh") != F.col("nh"), F.lit("changed"))
            .alias("change"),
        )
        .filter(F.col("change").isNotNull())
    )


def crawl_delta_sql(
    old_rel: str,
    new_rel: str,
    key_col: str = "url",
    content_cols: tuple[str, ...] = ("content",),
) -> str:
    """DuckDB mirror: same full-outer join + null-safe md5-digest."""
    def digest(cols: tuple[str, ...]) -> str:
        parts = ", ".join(
            f"coalesce('v' || CAST({c} AS VARCHAR), 'n')" for c in cols
        )
        return f"md5(concat_ws(chr(31), {parts}))"

    return f"""
    WITH o AS (SELECT {key_col} AS k, {digest(content_cols)} AS oh FROM {old_rel}),
    n AS (SELECT {key_col} AS k, {digest(content_cols)} AS nh FROM {new_rel}),
    j AS (SELECT coalesce(o.k, n.k) AS k, o.oh, n.nh
          FROM o FULL OUTER JOIN n ON o.k = n.k)
    SELECT k AS {key_col},
           CASE WHEN oh IS NULL THEN 'added'
                WHEN nh IS NULL THEN 'removed'
                WHEN oh <> nh THEN 'changed' END AS change
    FROM j
    WHERE (oh IS NULL OR nh IS NULL OR oh <> nh)
    """
