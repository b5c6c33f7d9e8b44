"""HTTP redirect-chain resolution — crawl URL canonicalization.

A real crawl's capture log is full of 3xx records: ``/r/a → /r/b →
/p/final``.  Before dedup, link-graph building, or recrawl diffing,
every alias URL must be rewritten to the page it ultimately lands on.

Two-phase design, exploiting the fact that redirect chains are almost
always **intra-host**:

1. **Bucket-local compression** — edges hash to buckets by host (one
   shuffle); inside each bucket an Arrow-batched kernel walks every
   chain through a dict with path memoization, so each bucket resolves
   in O(rows).  After this pass every pointer already covers its whole
   in-bucket run.
2. **Terminality + residue** — one merge join against the edge sources
   marks which compressed endpoints still have an outgoing edge.
   Endpoints without one are terminal: done.  The (tiny) remainder —
   chains that crossed a bucket boundary, plus in-bucket cycles — runs
   through **O(log L) pointer-doubling rounds** (the same halving trick
   as ``operators/clusters.py``), with an active/done split so finished
   pointers leave the probe side forever.

The bucketing is a pure PERFORMANCE choice: a chain that crosses hosts
(or a pathological bucket key) just lands in the residue loop — the
answer is identical, measured A/B in tests.  With the default host key
the loop usually runs ZERO rounds (measured 20 s → ~8 s at sf0.1,
456k chains / 3.2M edges, local[32]).

* :func:`resolve_redirects` — input ``(src, dst)`` with one outgoing
  edge per src (an HTTP redirect has exactly one Location).  Output one
  row per src: ``(src, final, hops, is_cycle)`` where ``final`` is the
  first URL with no outgoing redirect; exact hop counts.  Redirect
  *loops* never terminate, so anything whose accumulated hops reach
  ``max_hops`` is flagged ``is_cycle`` with a NULL final — the
  crawler's signal to drop the capture.  ``local_buckets=None``
  disables phase 1 (pure doubling — the generic path, kept honest by
  an equivalence test).

Scale shape at 10^10 captures: one bucket shuffle of ~100 B rows (html
never enters), one merge join, then residue rounds over a set that
shrinks geometrically; no broadcast anywhere (the lookup side is
O(|edges|) — a pinned merge join, measured: Spark's post-checkpoint
size estimate otherwise flips to a driver-OOM broadcast at 3.2M edges).

The synthetic corpus needs a capture log: :func:`redirect_captures_df`
derives one from the pages law — page ``uid`` owns a chain of
``c = 1 + uid % 13`` aliases ``/r/{uid}/{k}`` (k = 0..c-1), each
redirecting to the next, the last landing on the real ``/p/{uid}``.
The driver oracle derives every answer CLOSED-FORM from that law
(final = ``/p/{uid}``, hops = ``c − k``) — it never follows an edge, so
Spark's resolution is checked against an independent derivation.

Reference parity: none — webtext surface (BASELINE input_hint); the
residue shape (pointer jumping) is the public Wikipedia/GraphX CC
technique applied to functional graphs, and the local-pass + residue
composition mirrors the engine's own knn cell/brute split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


_COMP_SCHEMA = T.StructType(
    [
        T.StructField("node", T.StringType()),
        T.StructField("cur", T.StringType()),
        T.StructField("hops", T.LongType()),
    ]
)


def _compress_kernel(max_hops: int):
    """Per-bucket chain walk with path memoization: O(rows) amortized.
    Emits (node, cur, hops) where cur is the furthest URL reachable
    inside this bucket (exact hop count, capped at max_hops)."""

    def walk(pdf):
        import pandas as pd

        nxt = dict(zip(pdf["src"], pdf["dst"]))
        memo: dict = {}
        finals, hopss = [], []
        for s in pdf["src"]:
            if s in memo:
                f, h = memo[s]
                finals.append(f)
                hopss.append(h)
                continue
            path = [s]
            cur = nxt[s]
            hops = 1
            while cur in nxt and cur not in memo and hops < max_hops:
                path.append(cur)
                cur = nxt[cur]
                hops += 1
            if cur in memo:
                f0, h0 = memo[cur]
                cur = f0
                hops = min(hops + h0, max_hops)
            for i, node in enumerate(path):
                memo[node] = (cur, min(hops - i, max_hops))
            finals.append(cur)
            hopss.append(hops)
        return pd.DataFrame({"node": pdf["src"], "cur": finals, "hops": hopss})

    return walk


def resolve_redirects(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 64,
    local_buckets: int | None = 1024,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Resolve every redirect source to its terminal URL.  Returns
    ``(src, final, hops, is_cycle)``; ``final`` is NULL and ``is_cycle``
    True for sources trapped in a redirect loop (no terminal within
    ``max_hops``).

    ``bucket_expr`` keys the local-compression pass (default: the host
    part of ``src``).  The choice affects ONLY performance — chains
    that straddle buckets fall through to the exact doubling loop.
    """
    if local_buckets:
        if bucket_expr is None:
            bucket_expr = F.regexp_extract(F.col(src), r"^(?:[a-z+]+://)?([^/]+)", 1)
        bucketed = edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.pmod(F.xxhash64(bucket_expr), F.lit(local_buckets)).alias("_b"),
        )
        comp = bucketed.groupBy("_b").applyInPandas(
            _compress_kernel(max_hops), schema=_COMP_SCHEMA
        )
        # one merge join decides terminality: src is unique by contract
        # (one Location per redirect), so no dedup pass is needed and
        # the row count cannot grow.  No broadcast — both sides are
        # O(|edges|).
        marked = comp.join(
            edges.select(F.col(src).alias("cur"), F.lit(True).alias("_has_out")).hint(
                "merge"
            ),
            "cur",
            "left",
        ).localCheckpoint(eager=True)
        fin0 = F.col("_has_out").isNull() | (F.col("hops") >= max_hops)
        done_parts = [marked.filter(fin0).drop("_has_out")]
        active = marked.filter(~fin0).drop("_has_out")
    else:
        ptr = edges.select(
            F.col(src).alias("node"),
            F.col(dst).alias("cur"),
            F.lit(1).cast("long").alias("hops"),
        ).localCheckpoint(eager=True)
        done_parts = []
        active = ptr
    # pointer-doubling residue: each round, jump every active pointer
    # through the pointer of its cur (left merge self-join — a b-miss
    # means cur is terminal).  Finished pointers are STABLE, so they
    # leave the probe side forever; the active set shrinks
    # geometrically and the loop exits on the first empty round.
    while not active.isEmpty():
        lookup = active
        for part in done_parts:
            lookup = lookup.unionByName(part)
        stepped = active.alias("a").join(
            lookup.alias("b").hint("merge"),
            F.col("a.cur") == F.col("b.node"),
            "left",
        ).select(
            F.col("a.node").alias("node"),
            F.coalesce(F.col("b.cur"), F.col("a.cur")).alias("cur"),
            (F.col("a.hops") + F.coalesce(F.col("b.hops"), F.lit(0))).alias("hops"),
            F.col("b.node").isNotNull().alias("moved"),
        ).localCheckpoint(eager=True)  # truncate lineage per round
        finished = (~F.col("moved")) | (F.col("hops") >= max_hops)
        done_parts.append(stepped.filter(finished).drop("moved"))
        active = stepped.filter(~finished).drop("moved")
    out = done_parts[0]
    for part in done_parts[1:]:
        out = out.unionByName(part)
    return out.select(
        F.col("node").alias(src),
        F.when(F.col("hops") < max_hops, F.col("cur")).alias("final"),
        F.when(F.col("hops") < max_hops, F.col("hops")).alias("hops"),
        (F.col("hops") >= max_hops).alias("is_cycle"),
    )
