"""Deterministic Common-Crawl-style web-page table (the streamed side).

BASELINE.json ``input_hint`` fixes the input shape:
``(url: string, warc_ts: timestamp, html: binary, text: string,
lang: string)``.  No external data exists in this sandbox, so pages are
synthesised *deterministically from the driver's TPC-H lineitem table*:
every row of ``lineitem`` becomes one page whose id, url, timestamp, html
payload and geocoded coordinate are pure arithmetic on
``(l_orderkey, l_linenumber)``.  Because the derivation is closed-form it
is expressed three ways — Spark columns, DuckDB SQL, numpy — and all
three agree bit-for-bit, which is what the driver's value-hash compare
and the "byte-identical extracted text per url" invariant need.

Coordinate model (EPSG:25833-style metres, mirrors the reference's Oslo
test extent, ``io/read_parquet.py:23-34``): 40% of pages cluster in a
16 km Oslo hot-spot (the skew the north rule requires us to handle), the
rest are uniform over a 160 km square.  Randomness = a 31-bit LCG on the
page uid; division order in every formula is fixed so Spark and DuckDB
produce identical doubles.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2147483648  # 2^31

# page extent
UNI_X0, UNI_Y0, UNI_SPAN = 200000.0, 6560000.0, 160000.0
HOT_X0, HOT_Y0, HOT_SPAN = 254000.0, 6642000.0, 16000.0
HOT_MOD, HOT_LT = 10, 4  # uid % 10 < 4 -> hot cluster (40% of pages)

WARC_EPOCH = "2024-01-01 00:00:00"


def _lcg_sql(expr: str) -> str:
    return f"(({expr}) * {LCG_A} + {LCG_C}) % {LCG_M}"


def pages_sql(lineitem_rel: str = "lineitem") -> str:
    """DuckDB/ANSI SQL producing the pages relation (uid, url, x, y).

    Used verbatim inside every ``oracle_sql()`` entry, and mirrored
    column-for-column by :func:`pages_df`.
    """
    return f"""
    SELECT
      uid,
      concat('https://site', CAST(uid % 1000 AS VARCHAR), '.no/p/', CAST(uid AS VARCHAR)) AS url,
      CASE WHEN uid % {HOT_MOD} < {HOT_LT}
           THEN {HOT_X0} + (CAST(h1 AS DOUBLE) / {LCG_M}.0) * {HOT_SPAN}
           ELSE {UNI_X0} + (CAST(h1 AS DOUBLE) / {LCG_M}.0) * {UNI_SPAN} END AS x,
      CASE WHEN uid % {HOT_MOD} < {HOT_LT}
           THEN {HOT_Y0} + (CAST(h2 AS DOUBLE) / {LCG_M}.0) * {HOT_SPAN}
           ELSE {UNI_Y0} + (CAST(h2 AS DOUBLE) / {LCG_M}.0) * {UNI_SPAN} END AS y
    FROM (
      SELECT uid, h1, {_lcg_sql('h1')} AS h2
      FROM (
        SELECT uid, {_lcg_sql('uid')} AS h1
        FROM (
          -- lineitem's (orderkey, linenumber) is not unique in the synthetic
          -- data; pages must have unique ids (urls), so dedupe the key.
          SELECT DISTINCT l_orderkey * 8 + l_linenumber AS uid FROM {lineitem_rel}
        )
      )
    )
    """


def pages_df(spark: SparkSession, sf_dir: str, with_payload: bool = False) -> DataFrame:
    """The pages DataFrame — native column expressions only (whole-stage
    codegen end to end; the 10^12-row side never touches Python).

    with_payload=True adds the input_hint columns (warc_ts, html, text,
    lang); html embeds the coordinate so text-extraction parity is
    checkable byte-for-byte.
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    uid = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("long").alias("uid")
    df = li.select(uid).distinct()
    h1 = (F.col("uid") * LCG_A + LCG_C) % LCG_M
    df = df.withColumn("h1", h1)
    df = df.withColumn("h2", (F.col("h1") * LCG_A + LCG_C) % LCG_M)
    hot = (F.col("uid") % HOT_MOD) < HOT_LT
    x = F.when(hot, HOT_X0 + (F.col("h1").cast("double") / float(LCG_M)) * HOT_SPAN).otherwise(
        UNI_X0 + (F.col("h1").cast("double") / float(LCG_M)) * UNI_SPAN
    )
    y = F.when(hot, HOT_Y0 + (F.col("h2").cast("double") / float(LCG_M)) * HOT_SPAN).otherwise(
        UNI_Y0 + (F.col("h2").cast("double") / float(LCG_M)) * UNI_SPAN
    )
    url = F.concat(
        F.lit("https://site"),
        (F.col("uid") % 1000).cast("string"),
        F.lit(".no/p/"),
        F.col("uid").cast("string"),
    )
    df = df.select(
        F.col("uid"),
        url.alias("url"),
        x.alias("x"),
        y.alias("y"),
    )
    if with_payload:
        df = with_page_payload(df)
    return df


def with_page_payload(df: DataFrame) -> DataFrame:
    """Attach the input_hint payload columns to a (uid, url, x, y) frame.

    ``html`` is a deterministic templated page that *embeds* the
    coordinates; ``text`` is what the extraction parser must recover
    byte-identically (tested in tests/test_pages.py).  All native
    expressions — no UDF.
    """
    text = F.concat(
        F.lit("page "),
        F.col("uid").cast("string"),
        F.lit(" located at E"),
        F.format_string("%.3f", F.col("x")),
        F.lit(" N"),
        F.format_string("%.3f", F.col("y")),
    )
    html = F.concat(
        F.lit("<html><head><title>p"),
        F.col("uid").cast("string"),
        F.lit('</title></head><body><p class="geo" data-x="'),
        F.format_string("%.3f", F.col("x")),
        F.lit('" data-y="'),
        F.format_string("%.3f", F.col("y")),
        F.lit('">'),
        text,
        F.lit("</p></body></html>"),
    )
    lang = F.element_at(
        F.array(F.lit("no"), F.lit("nn"), F.lit("se"), F.lit("en")),
        (F.col("uid") % 4 + 1).cast("int"),
    )
    return (
        df.withColumn("warc_ts", F.timestamp_seconds(F.unix_timestamp(F.lit(WARC_EPOCH)) + F.col("uid")))
        .withColumn("html", F.encode(html, "UTF-8"))
        .withColumn("text", text)
        .withColumn("lang", lang)
    )


def pages_np(uids: np.ndarray):
    """numpy mirror of the coordinate derivation (pytest oracle)."""
    uids = uids.astype(np.int64)
    h1 = (uids * LCG_A + LCG_C) % LCG_M
    h2 = (h1 * LCG_A + LCG_C) % LCG_M
    hot = (uids % HOT_MOD) < HOT_LT
    x = np.where(
        hot,
        HOT_X0 + (h1.astype(np.float64) / float(LCG_M)) * HOT_SPAN,
        UNI_X0 + (h1.astype(np.float64) / float(LCG_M)) * UNI_SPAN,
    )
    y = np.where(
        hot,
        HOT_Y0 + (h2.astype(np.float64) / float(LCG_M)) * HOT_SPAN,
        UNI_Y0 + (h2.astype(np.float64) / float(LCG_M)) * UNI_SPAN,
    )
    return x, y


def extract_text_from_html(html_bytes) -> str:
    """The Arrow-batched extraction parser's scalar form: recover ``text``
    from ``html`` (byte-identical per url — the input_hint invariant).
    The batch form lives in operators/textops.py."""
    s = html_bytes.decode("utf-8") if isinstance(html_bytes, (bytes, bytearray)) else html_bytes
    start = s.index('">', s.index('class="geo"')) + 2
    end = s.index("</p>", start)
    return s[start:end]
