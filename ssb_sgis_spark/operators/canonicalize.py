"""URL canonicalization: ``<link rel=canonical>`` + redirect chains.

A crawl sees the same logical page under many URLs: tracking-parameter
aliases 301 to a landing URL, which itself *declares* a preferred URL
via ``<link rel="canonical" href="...">``.  The full canonicalization
map every dedup / link-graph / recrawl stage needs is the composition

    alias --(redirect chain)--> final URL --(rel=canonical)--> canonical

* :func:`extract_canonical` — pull the canonical href out of the html
  payload with one codegen ``regexp_extract`` (native expr, html never
  leaves the JVM, map-only); rows without a declaration fall back to
  their own URL.
* :func:`canonical_map` — compose redirect resolution
  (:func:`operators.redirects.resolve_redirects`, O(log L) pointer
  doubling) with the canonical declarations: one hash join of the
  ~100-byte resolved alias rows against the (url → canonical) table,
  then a union with the pages' own rows.  Cycle-trapped aliases get a
  NULL canonical (the crawler drops them).  Html and text columns never
  enter the join — only urls travel.

Scale shape at 10^12 pages: extract is map-only; the alias→final join
is url-keyed (AQE skew-split absorbs mega-sites whose million aliases
all land on one final URL); the union is exchange-free.

Synthetic law: pages declare a canonical of ``/c/{uid}`` when
``uid % 3 == 0`` (a "clean" URL distinct from the crawl URL), else
self; aliases come from the redirect law (operators/redirects.py).
The driver oracle derives every (url, canonical) pair CLOSED-FORM from
uid arithmetic — it never parses html and never follows an edge.

Reference parity: none — webtext surface (BASELINE input_hint); the
composition order (redirects then rel=canonical) is the public Google
Search Central / IETF RFC 6596 semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["canonical_pages_df", "extract_canonical", "canonical_map"]

_CANON_RE = '<link rel="canonical" href="([^"]+)"'


def canonical_pages_df(pages: DataFrame) -> DataFrame:
    """(uid, url, html) where html declares a rel=canonical href of
    ``/c/{uid}`` when uid % 3 == 0 (else no declaration) — native
    exprs only."""
    site = F.concat(F.lit("https://site"), (F.col("uid") % 1000).cast("string"), F.lit(".no"))
    link = F.when(
        F.col("uid") % 3 == 0,
        F.concat(
            F.lit('<link rel="canonical" href="'),
            site,
            F.lit("/c/"),
            F.col("uid").cast("string"),
            F.lit('">'),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head>"),
        link,
        F.lit("</head><body><p>side "),
        F.col("uid").cast("string"),
        F.lit("</p></body></html>"),
    )
    return pages.select("uid", "url", F.encode(html, "UTF-8").alias("html"))


def extract_canonical(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    out_col: str = "canonical",
) -> DataFrame:
    """(url, canonical) per page: the declared rel=canonical href, or
    the page's own URL when none is declared.  One codegen regex — the
    html bytes never cross to Python and never shuffle."""
    href = F.regexp_extract(F.decode(F.col(html_col), "UTF-8"), _CANON_RE, 1)
    return df.select(
        F.col(url_col).alias("url"),
        F.when(href == "", F.col(url_col)).otherwise(href).alias(out_col),
    )


def canonical_map(
    pages: DataFrame,
    edges: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_hops: int = 64,
) -> DataFrame:
    """The full (url → canonical) map over aliases AND landing pages.

    ``edges`` is the (src, dst) redirect log.  Aliases resolve through
    their chain first, then adopt the final page's declared canonical;
    redirect loops yield NULL.  Pages map through their own
    declaration.  Only url-sized rows shuffle.
    """
    from .redirects import resolve_redirects

    canon = extract_canonical(pages, url_col, html_col)
    resolved = resolve_redirects(edges, max_hops=max_hops).select(
        F.col("src").alias("url"), F.col("final").alias("_final")
    )
    alias_rows = resolved.join(
        canon.select(F.col("url").alias("_final"), "canonical"), "_final", "left"
    ).select("url", "canonical")
    return alias_rows.unionByName(canon)
