"""Sitemap-protocol parsing (sitemaps.org XML) — crawl discovery, the
third leg of the crawl layer next to robots (politeness) and links
(graph).

:func:`parse_sitemap` turns a column of sitemap XML documents into one
row per entry, handling both root kinds (``<urlset>`` page lists and
``<sitemapindex>`` indexes of further sitemaps) and the OPTIONAL
per-entry fields (``lastmod``/``changefreq``/``priority``) that make
naive parallel-array xpath extraction misalign: the kernel first
isolates each ``<url>``/``<sitemap>`` block with a codegen ``(?s)``
regex, then extracts each field inside its own block — all JVM
(``regexp_extract_all`` + ``posexplode`` + ``regexp_extract``), map-only,
no Python workers, the XML never shuffles.

Scale shape: sitemaps are |hosts|-sized, not |pages|-sized (one XML doc
per host, ≤50k entries each per the protocol), so even 10^8 hosts parse
as a map-only scan; the output explode is bounded by the protocol's
entry cap.  The per-host XML SYNTHESIS (:func:`sitemap_xml_of_pages`,
test scaffolding like ``links.anchored_pages``) is one
sort_array+collect_list groupBy — deterministic entry order so both
engines build byte-identical documents.

Reference parity: none — webtext surface (BASELINE input_hint);
the sitemap protocol (sitemaps.org, RFC-adjacent) is the public spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_sitemap", "sitemap_xml_of_pages"]

_BLOCK_RE = r"(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"
_FIELD = {
    "loc": r"(?s)<loc>\s*(.*?)\s*</loc>",
    "lastmod": r"(?s)<lastmod>\s*(.*?)\s*</lastmod>",
    "changefreq": r"(?s)<changefreq>\s*(.*?)\s*</changefreq>",
    "priority": r"(?s)<priority>\s*(.*?)\s*</priority>",
}


def parse_sitemap(
    df: DataFrame, xml_col: str = "sitemap_xml", keep: list[str] | None = None
) -> DataFrame:
    """One row per sitemap entry: ``(keep..., pos, kind, loc, lastmod,
    changefreq, priority)``.  ``kind`` is ``page`` for ``<urlset>``
    roots and ``sitemap`` for ``<sitemapindex>`` roots (feed the latter
    back through a fetch + parse_sitemap round for nested indexes).
    Optional fields come back NULL when absent; entries with no
    ``<loc>`` are dropped (nothing to crawl)."""
    keep = keep if keep is not None else []
    xml = F.col(xml_col)
    kind = F.when(
        xml.rlike(r"(?s)<\s*sitemapindex[\s>]"), F.lit("sitemap")
    ).otherwise(F.lit("page"))
    blocks = F.regexp_extract_all(xml, F.lit(_BLOCK_RE), F.lit(1))
    exploded = df.select(
        *keep, kind.alias("kind"), F.posexplode(blocks).alias("pos", "_b")
    )

    def field(name):
        # regexp_extract returns '' on no match; NULL is the honest value
        v = F.regexp_extract(F.col("_b"), _FIELD[name], 1)
        return F.when(v != "", v).alias(name)

    return exploded.select(
        *keep, "pos", "kind", field("loc"), field("lastmod"),
        field("changefreq"), field("priority"),
    ).filter(F.col("loc").isNotNull())


def sitemap_xml_of_pages(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    host_expr=None,
) -> DataFrame:
    """Deterministic per-host sitemap synthesis from a pages frame:
    ``(host, sitemap_xml)`` with one ``<url>`` entry per page, entries
    sorted by url (sort_array ⇒ both engines build identical bytes).
    Field law exercises optionality: ``lastmod`` (the warc_ts date) is
    OMITTED when ``uid % 5 = 0``; ``priority`` ((uid%10)/10) is emitted
    only when ``uid % 3 = 0``."""
    from ssb_sgis_spark.functions.url import host_col

    host = host_expr if host_expr is not None else host_col(F.col(url_col))
    uid = F.col("uid")
    entry = F.concat(
        F.lit("<url><loc>"),
        F.col(url_col),
        F.lit("</loc>"),
        F.when(
            uid % 5 != 0,
            F.concat(
                F.lit("<lastmod>"),
                F.date_format(F.col(ts_col), "yyyy-MM-dd"),
                F.lit("</lastmod>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            uid % 3 == 0,
            F.concat(
                F.lit("<priority>0."),
                (uid % 10).cast("string"),
                F.lit("</priority>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    return (
        pages.select(host.alias("host"), entry.alias("_e"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit('<?xml version="1.0" encoding="UTF-8"?>'),
                F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
                F.array_join(F.sort_array(F.collect_list("_e")), ""),
                F.lit("</urlset>"),
            ).alias("sitemap_xml")
        )
    )
