"""HTTP redirect-chain resolution — crawl URL canonicalization.

A real crawl's capture log is full of 3xx records: ``/r/a → /r/b →
/p/final``.  Before dedup, link-graph building, or recrawl diffing,
every alias URL must be rewritten to the page it ultimately lands on.
Following chains one hop at a time is O(longest chain) sequential
passes over the whole capture table; this module resolves ALL chains in
**O(log L) rounds of pointer doubling** instead — the same halving trick
as the engine's connected-components kernel (``operators/clusters.py``):
after round k every pointer has skipped ``2^k`` hops, so a 64-hop chain
resolves in 6 self-joins of the (tiny) edge table.

* :func:`resolve_redirects` — input ``(src, dst)`` with one outgoing
  edge per src (an HTTP redirect has exactly one Location).  Output one
  row per src: ``(src, final, hops, is_cycle)`` where ``final`` is the
  first URL with no outgoing redirect.  Finished pointers leave the
  probe side forever (active/done split), so the per-round probe
  shuffle shrinks geometrically; rounds stop early as soon as the
  active set is empty (one ``isEmpty`` probe per round, lineage
  truncated by ``localCheckpoint`` exactly like clusters.py);
  redirect *loops* never terminate, so anything still unresolved once
  accumulated hops exceed ``max_hops`` is flagged ``is_cycle`` with a
  NULL final — the crawler's signal to drop the capture.

Scale shape at 10^10 captures: each round shuffles only the unresolved
pointer rows (src/cur/hops — ~100 B, never html), and the unresolved
set SHRINKS geometrically as chains complete; hot canonical targets
(every alias of a big site points at one final URL) sit on the
``cur``-probe side of a plain hash equi-join, which AQE skew-split
handles — the build side (one row per redirect SOURCE) is unique by
construction.

The synthetic corpus needs a capture log: :func:`redirect_captures_df`
derives one from the pages law — page ``uid`` owns a chain of
``c = 1 + uid % 13`` aliases ``/r/{uid}/{k}`` (k = 0..c-1), each
redirecting to the next, the last landing on the real ``/p/{uid}``.
The driver oracle derives every answer CLOSED-FORM from that law
(final = ``/p/{uid}``, hops = ``c − k``) — it never follows an edge, so
Spark's join-based resolution is checked against an independent
derivation, and chain lengths up to 13 force the doubling loop through
4 real rounds.

Reference parity: none — webtext surface (BASELINE input_hint); the
operator shape (pointer jumping) is the public Wikipedia/GraphX CC
technique applied to functional graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["redirect_captures_df", "resolve_redirects"]


def redirect_captures_df(pages: DataFrame, chain_mod: int = 13) -> DataFrame:
    """Deterministic 3xx capture log from the pages law (native exprs
    only).  One chain per page: ``/r/{uid}/0 → … → /r/{uid}/{c-1} →
    /p/{uid}`` with ``c = 1 + uid % chain_mod``."""
    c = (F.lit(1) + F.col("uid") % chain_mod).cast("int")
    site = F.concat(F.lit("https://site"), (F.col("uid") % 1000).cast("string"), F.lit(".no"))
    k = F.explode(F.sequence(F.lit(0), c - 1)).alias("k")
    rows = pages.select("uid", site.alias("site"), c.alias("c"), k)
    alias_url = F.concat(
        F.col("site"), F.lit("/r/"), F.col("uid").cast("string"), F.lit("/"),
        F.col("k").cast("string"),
    )
    nxt = F.when(
        F.col("k") == F.col("c") - 1,
        F.concat(F.col("site"), F.lit("/p/"), F.col("uid").cast("string")),
    ).otherwise(
        F.concat(
            F.col("site"), F.lit("/r/"), F.col("uid").cast("string"), F.lit("/"),
            (F.col("k") + 1).cast("string"),
        )
    )
    return rows.select(alias_url.alias("src"), nxt.alias("dst"))


def resolve_redirects(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 64,
) -> DataFrame:
    """Resolve every redirect source to its terminal URL in O(log L)
    pointer-doubling rounds.  Returns ``(src, final, hops, is_cycle)``.

    ``final`` is NULL and ``is_cycle`` True for sources trapped in a
    redirect loop (no terminal within ``max_hops``).
    """
    # ptr: for each known source, the furthest endpoint reached so far
    # and the TRUE hop count to it (exact under doubling: new hop count
    # is a.hops + hops-of-(a.cur)'s-pointer).  done ⇔ cur has no
    # outgoing edge — detected by the same left self-join that performs
    # the jump (b-miss ⇒ terminal), so termination costs no extra pass.
    ptr = edges.select(
        F.col(src).alias("node"),
        F.col(dst).alias("cur"),
        F.lit(1).cast("long").alias("hops"),
    ).localCheckpoint(eager=True)
    # active/done split: finished pointers are STABLE under further
    # rounds, so they leave the probe side forever — per-round probe
    # shuffle shrinks geometrically as chains complete.  The lookup
    # (build) side must stay full: an active pointer's cur may be any
    # node, finished or not.  done_parts holds ≤ ceil(log2(max_hops))
    # checkpointed fragments.
    active = ptr
    done_parts: list[DataFrame] = []
    while True:
        lookup = active
        for part in done_parts:
            lookup = lookup.unionByName(part)
        stepped = active.alias("a").join(
            lookup.alias("b"), F.col("a.cur") == F.col("b.node"), "left"
        ).select(
            F.col("a.node").alias("node"),
            F.coalesce(F.col("b.cur"), F.col("a.cur")).alias("cur"),
            (F.col("a.hops") + F.coalesce(F.col("b.hops"), F.lit(0))).alias("hops"),
            F.col("b.node").isNotNull().alias("moved"),
        ).localCheckpoint(eager=True)  # truncate lineage per round
        finished = (~F.col("moved")) | (F.col("hops") >= max_hops)
        done_parts.append(stepped.filter(finished).drop("moved"))
        active = stepped.filter(~finished).drop("moved")
        if active.isEmpty():
            break
    out = done_parts[0]
    for part in done_parts[1:]:
        out = out.unionByName(part)
    return out.select(
        F.col("node").alias(src),
        F.when(F.col("hops") < max_hops, F.col("cur")).alias("final"),
        F.when(F.col("hops") < max_hops, F.col("hops")).alias("hops"),
        (F.col("hops") >= max_hops).alias("is_cycle"),
    )
