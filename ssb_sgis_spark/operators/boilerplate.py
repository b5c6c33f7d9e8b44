"""Per-host template (boilerplate) line removal.

Web pages from one host share nav bars, cookie banners, and footers;
training corpora strip them by the classic shard-level frequency rule
(CCNet / C4 lineage): a line that occurs on at least ``frac`` of a
host's pages is TEMPLATE and is removed from every page of that host —
unlike corpus-wide paragraph dedup (operators/dedup.py para_dedup),
which keeps one winner; template lines are site furniture, so no copy
survives.

Two-pass shape built for 10^12 pages:

1. :func:`host_template_lines` — explode lines, hash them, count
   DISTINCT PAGES per (host, line_hash) (map-side-combinable agg; only
   64-bit hashes shuffle, never line text), join per-host page counts,
   keep hashes with ``pages_with_line >= ceil(frac * host_pages)`` on
   hosts with at least ``min_pages`` pages.  Output is tiny: one row
   per (host, template line).
2. :func:`strip_template_lines` — collect the template hashes into one
   array row per host and join that onto the PAGES table (one row per
   page, not per line), then rebuild the text natively with
   ``filter(split(text), l -> !array_contains(tpl, xxhash64(l)))`` —
   the text column never enters a shuffle and never leaves the JVM;
   the only exchange is the host-keyed join, whose build side is
   hosts-sized — Spark broadcasts it (verified BroadcastHashJoin in the
   executed plan at test scale), so text crosses ZERO shuffles; past
   the broadcast threshold (~10^8 hosts) the join degrades to one
   host-keyed shuffle of the pages side, where AQE skew-split handles
   hot hosts.

The naive alternative — explode, anti-join, groupBy(page) to reassemble
— shuffles every text byte twice; this plan shuffles none.

Synthetic law: :func:`boilerplate_pages_df` gives every page of host
``site{S}`` a nav line and a footer line (host-constant → template), a
per-page unique content line (kept), and a promo line on only the
even-uid half of the host's pages (below an 0.8 threshold → kept).
The driver oracle derives the expected stripped text CLOSED-FORM from
per-host page counts (it counts pages, never lines), an independent
derivation of the same decision rule.

Reference parity: none — webtext surface (BASELINE input_hint); the
frequency rule is the public CCNet (Wenzek et al. 2020) / C4 technique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "boilerplate_pages_df",
    "host_template_lines",
    "strip_template_lines",
    "remove_boilerplate",
]


def host_template_lines(
    df: DataFrame,
    text_col: str = "text",
    host_col: str = "host",
    frac: float = 0.8,
    min_pages: int = 10,
    id_col: str | None = None,
) -> DataFrame:
    """Template line hashes per host: ``(host, line_hash)`` for lines
    present on >= frac of the host's pages (hosts below ``min_pages``
    never yield template lines — small samples can't establish
    furniture).  Only hashes shuffle; counts are distinct-page counts,
    robust to a line repeating inside one page.  ``id_col`` names a
    unique page id; without one a per-row id is minted (deterministic
    given deterministic input partitioning).

    The threshold is applied as an EXACT rational (``Fraction(str(frac))``,
    integer cross-multiplication) so Spark and any SQL oracle agree
    bit-for-bit at the boundary — no float-ceil ambiguity."""
    from fractions import Fraction

    r = Fraction(str(frac))
    pid = F.col(id_col) if id_col else F.monotonically_increasing_id()
    lines = df.select(
        F.col(host_col).alias("host"),
        pid.alias("_pid"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).select("host", "_pid", F.xxhash64("line").alias("line_hash"))
    per_line = lines.groupBy("host", "line_hash").agg(
        F.countDistinct("_pid").alias("pages_with_line")
    )
    per_host = df.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("host_pages")
    )
    return (
        per_line.join(per_host, "host")
        .filter(
            (F.col("host_pages") >= min_pages)
            & (
                F.col("pages_with_line") * r.denominator
                >= F.lit(r.numerator) * F.col("host_pages")
            )
        )
        .select("host", "line_hash")
    )


def strip_template_lines(
    df: DataFrame,
    template: DataFrame,
    text_col: str = "text",
    host_col: str = "host",
    out_col: str | None = None,
) -> DataFrame:
    """Remove every template line from every page of its host.  The
    text column is rebuilt in place with native array expressions — it
    crosses no shuffle and no Python boundary; only the hosts-sized
    template array table is joined in."""
    out_col = out_col or text_col
    tpl = template.groupBy(F.col("host").alias("_tpl_host")).agg(
        F.collect_set("line_hash").alias("_tpl")
    )
    joined = df.join(
        tpl, F.col(host_col) == F.col("_tpl_host"), "left"
    ).drop("_tpl_host")
    kept = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda l: F.col("_tpl").isNull() | ~F.array_contains(F.col("_tpl"), F.xxhash64(l)),
    )
    return joined.withColumn(out_col, F.array_join(kept, "\n")).drop("_tpl")


def remove_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    host_col: str = "host",
    frac: float = 0.8,
    min_pages: int = 10,
    id_col: str | None = None,
) -> DataFrame:
    """host_template_lines + strip_template_lines in one call."""
    tpl = host_template_lines(df, text_col, host_col, frac, min_pages, id_col)
    return strip_template_lines(df, tpl, text_col, host_col)


# --- deterministic law corpus (native exprs) ---------------------------

def boilerplate_pages_df(pages: DataFrame) -> DataFrame:
    """(uid, host, text) where text carries two host-constant template
    lines, one unique line, and one half-frequency promo line."""
    site = F.concat(F.lit("site"), (F.col("uid") % 1000).cast("string"))
    promo = F.when(
        F.col("uid") % 2 == 0, F.concat(F.lit("\npromo "), site, F.lit(" tilbud"))
    ).otherwise(F.lit(""))
    text = F.concat(
        F.lit("nav "), site, F.lit(" meny"),
        F.lit("\npage "), F.col("uid").cast("string"), F.lit(" unikt innhold"),
        promo,
        F.lit("\nfooter "), site, F.lit(" kontakt"),
    )
    return pages.select("uid", site.alias("host"), text.alias("text"))
