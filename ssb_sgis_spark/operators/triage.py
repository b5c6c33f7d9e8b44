"""Fetch-log triage — capture disposition before ingestion.

Every crawl cycle ends with a triage pass over the fetch log: which
captures enter the corpus, which feed the redirect resolver, which
signal dead or lying URLs (a *soft 404* is an HTTP 200 whose body is
an error page — servers that return 200 for everything would otherwise
poison dedup and quality stats; every production crawler classifies
them with body heuristics).

:func:`classify_fetches` is one map-only native CASE over
``(http_status, text)`` — no shuffle, no Python — with the standard
precedence:

1. ``redirect``      — 3xx (feeds operators/redirects.py)
2. ``client_error``  — 4xx
3. ``server_error``  — 5xx
4. ``empty``         — 200 with a blank body
5. ``soft_404``      — 200 whose body matches error-page phrases
   within the first ``probe_chars`` characters AND is shorter than
   ``max_error_len`` (long pages mentioning "not found" are content)
6. ``ok``            — everything else

Synthetic law: status and body pathologies assigned by uid arithmetic
(3xx / 4xx / 5xx / soft-404 marker / blank body / normal), so the
driver oracle replays the SAME precedence CASE on DuckDB directly from
uid — it never reads a status or body.

Reference parity: none — webtext surface (BASELINE input_hint); the
soft-404 heuristic class is the public Bar-Yossef et al. "sic transit
gloria telae" / crawler-engineering standard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fetch_log_df", "classify_fetches"]

SOFT404_RE = "(?i)(page not found|404 error|does not exist|no longer available)"


def classify_fetches(
    df: DataFrame,
    status_col: str = "http_status",
    text_col: str = "text",
    probe_chars: int = 512,
    max_error_len: int = 1024,
    out_col: str = "disposition",
) -> DataFrame:
    """Append the capture disposition column (map-only)."""
    s, t = F.col(status_col), F.col(text_col)
    probe = F.substring(t, 1, probe_chars)
    disp = (
        F.when((s >= 300) & (s < 400), F.lit("redirect"))
        .when((s >= 400) & (s < 500), F.lit("client_error"))
        .when(s >= 500, F.lit("server_error"))
        .when(F.length(F.trim(t)) == 0, F.lit("empty"))
        .when(
            probe.rlike(SOFT404_RE) & (F.length(t) < max_error_len),
            F.lit("soft_404"),
        )
        .otherwise(F.lit("ok"))
    )
    return df.withColumn(out_col, disp)


def fetch_log_df(pages: DataFrame) -> DataFrame:
    """Law fetch log: (uid, url, http_status, text) with pathologies by
    uid arithmetic — 3xx (uid%17=0), 4xx (%19=0), 5xx (%23=0), blank
    body (%29=0), soft-404 marker (%13=0), else normal content.
    Precedence of the law mirrors the classifier's (status first)."""
    uid = F.col("uid")
    status = (
        F.when(uid % 17 == 0, F.lit(301))
        .when(uid % 19 == 0, F.lit(404))
        .when(uid % 23 == 0, F.lit(500))
        .otherwise(F.lit(200))
        .cast("int")
    )
    text = (
        F.when(uid % 29 == 0, F.lit("  "))
        .when(
            uid % 13 == 0,
            F.concat(F.lit("Page Not Found - side "), uid.cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("innhold for side "),
                uid.cast("string"),
                F.lit(" med nyttig tekst"),
            )
        )
    )
    return pages.select("uid", "url", status.alias("http_status"), text.alias("text"))
