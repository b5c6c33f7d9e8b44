"""Crawl-frontier scheduling — the politeness-aware "generate" step.

A crawler cycle takes the candidate frontier (url, host, priority) and
must emit a fetch plan that (a) never hits one host faster than its
crawl delay, (b) fetches high-priority URLs first within each host,
(c) keeps same-host fetches on the same fetcher (politeness is
per-fetcher state), and (d) bounds how much of a mega-host one cycle
swallows.  That is exactly the public Nutch/StormCrawler generate
semantics, re-expressed as one declarative plan:

* per-host priority rank — a window over host.  Hot hosts are
  pre-capped with the engine's salted two-stage top-K
  (:func:`operators.domains.per_key_topk`), so no single window
  partition ever sorts more than ``cap`` rows after a salted prefilter
  bounds it to ``cap × nsalts`` — the 10^7-URL host cannot serialize a
  task.
* fetch offset — ``(rank − 1) × delay_ms``: politeness serializes a
  host by construction, so the offset IS the schedule; no iterative
  simulation needed.
* fetcher assignment — ``xxhash64(host) mod n_fetchers``: all fetches
  of a host land on one fetcher, hosts spread uniformly.

One host-keyed exchange end to end (the cap's salted pass + the final
window share it); priorities, urls and delays are the only columns that
travel.

Synthetic law: priority = the page's LCG draw ``h1``, crawl delay =
``500 + (site % 5) × 250`` ms — both pure uid arithmetic, so the driver
oracle reproduces rank/offset/fetcher with an independent SQL window
over the same law (DuckDB's window engine vs Spark's, same totally
ordered key: priority DESC, url).

Reference parity: none — webtext surface (BASELINE input_hint); the
semantics are the public Apache Nutch generator contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["frontier_df", "schedule_frontier"]


def schedule_frontier(
    df: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str = "priority",
    delay_col: str | Column | int = 1000,
    n_fetchers: int = 64,
    max_per_cycle: int | None = None,
    nsalts: int = 32,
) -> DataFrame:
    """Emit the fetch plan ``(url, host, rank, fetch_offset_ms,
    fetcher)`` for one crawl cycle.

    ``delay_col``: per-host crawl delay in ms — a column name, Column,
    or int constant.  ``max_per_cycle`` bounds every host's slice of
    the cycle (skew-safe salted prefilter + exact window).  Ordering
    within a host is total: priority DESC, then url — deterministic
    under retries.
    """
    delay = (
        F.lit(delay_col)
        if isinstance(delay_col, int)
        else (F.col(delay_col) if isinstance(delay_col, str) else delay_col)
    )
    order = [F.desc(priority_col), F.col(url_col)]
    if max_per_cycle is not None:
        from .domains import per_key_topk

        df = per_key_topk(
            df, host_col, order, max_per_cycle, tie_id=url_col, nsalts=nsalts
        )
    w = Window.partitionBy(host_col).orderBy(*order)
    rank = F.row_number().over(w)
    return df.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        rank.alias("rank"),
        ((rank - 1).cast("long") * delay.cast("long")).alias("fetch_offset_ms"),
        F.pmod(F.xxhash64(F.col(host_col)), F.lit(n_fetchers)).cast("int").alias("fetcher"),
    )


def frontier_df(pages: DataFrame) -> DataFrame:
    """Law frontier: (url, host, priority, delay_ms) from uid
    arithmetic — priority is the page's LCG draw, delay is
    ``500 + (site % 5) * 250`` ms."""
    site = (F.col("uid") % 1000).cast("long")
    h1 = (F.col("uid") * 1103515245 + 12345) % 2147483648
    return pages.select(
        "url",
        F.concat(F.lit("site"), site.cast("string")).alias("host"),
        h1.alias("priority"),
        (F.lit(500) + (site % 5) * 250).alias("delay_ms"),
    )
