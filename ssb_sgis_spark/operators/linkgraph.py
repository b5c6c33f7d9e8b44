"""Link-graph operators: deterministic edge synthesis + fixed-point
integer PageRank.

The web-corpus workload the reference never had but every crawl pipeline
runs: rank pages by the link graph.  Two design decisions make it fit
this engine's verification model:

* **Closed-form edges.**  The synthetic corpus has no anchor tags, so
  the citation graph is derived from ids alone: node ``i`` emits
  ``1 + i % 4`` edges to ``(i * 48271 + k * 16807) % n``.  Both engines
  generate the SAME edge list from the same table with pure integer
  arithmetic — no data files, no RNG.
* **Integer fixed-point ranks.**  Classic float PageRank can never be
  compared bit-for-bit across engines (sum order, libm).  Ranks here
  live in integer MICRO-units: ``r0 = 10^6``; each round every node
  sends ``r div outdeg`` (integer division) along its edges and
  ``r' = 150000 + (85 * Σ contrib) div 100``.  Every operation is exact
  64-bit integer arithmetic, so 5 rounds of Spark shuffles equal 5
  unrolled DuckDB CTEs EXACTLY.  (Truncating division leaks a few
  micro-units of mass per round — deterministic, identical in both
  engines, and irrelevant to ranking.)

Scale shape (10^12-edge graph):
* per-round cost = one shuffle of (src, rank) x one shuffle of
  (dst, contrib) — both map-side combinable; the edge table itself is
  scanned once per round and NEVER re-derived (eager localCheckpoint);
* ranks are one row per NODE (not per edge), so the iterated state is
  the small side; a real deployment would bucket edges by src so the
  join is co-located — documented here, not needed at bench scale;
* rounds are fixed (no driver-side convergence collect in the hot
  loop), so the whole run is ``2 * n_iter`` shuffles, period.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "link_edges",
    "link_edges_sql",
    "pagerank",
    "pagerank_round",
    "pagerank_sql",
    "pagerank_weighted",
    "pagerank_weighted_sql",
    "hits",
    "hits_sql",
    "triangle_counts",
    "triangle_counts_sql",
    "pagerank_seeded",
    "pagerank_seeded_sql",
    "random_walks",
    "random_walks_sql",
]

# closed-form edge constants (Lehmer/Park-Miller multipliers — chosen
# only for being well-mixed odd constants, no cryptographic intent)
_A = 48271
_B = 16807

R0_MICRO = 1_000_000  # initial rank, micro-units
TELEPORT_MICRO = 150_000  # (1 - d) * 10^6 with damping d = 0.85


def link_edges(df: DataFrame, id_col: str = "doc_id", n: int | None = None) -> DataFrame:
    """Deterministic citation edges ``(src, dst)`` over the ids of
    ``df``: node ``i`` links to ``(i * A + k * B) % n`` for
    ``k = 1 .. 1 + i % 4``.  ``n`` defaults to a count() of the frame
    (pass it when known to keep the plan action-free)."""
    if n is None:
        n = df.count()
    k = F.explode(F.sequence(F.lit(1), (F.col(id_col) % 4 + 1).cast("int")))
    return (
        df.select(F.col(id_col).alias("src"), k.alias("_k"))
        .select(
            "src",
            ((F.col("src") * _A + F.col("_k") * _B) % F.lit(int(n))).alias("dst"),
        )
    )


def link_edges_sql(rel: str, id_col: str = "doc_id", n: int | str = 0) -> str:
    """DuckDB mirror of :func:`link_edges`.  ``n`` is the row count —
    an int, or a SQL scalar subquery string like
    ``"(SELECT count(*) FROM documents)"``."""
    return f"""
    SELECT {id_col} AS src,
           ({id_col} * {_A} + k * {_B}) % {n} AS dst
    FROM {rel}, unnest(range(1, {id_col} % 4 + 2)) r(k)
    """


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    n_iter: int = 5,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Fixed-point integer PageRank: ``(id_col, rank_micro)`` after
    ``n_iter`` exact rounds (see module docstring for the arithmetic).

    ``nodes`` is one row per vertex; ``edges`` has columns (src, dst).
    Vertices without in-links settle at the teleport mass; vertices
    without out-links simply leak their mass (deterministic, mirrored).

    Rounds chain LAZILY (the whole fixed-round run is one Spark job),
    matching :func:`label_propagation`'s loop hygiene: per-round eager
    checkpoints made fixed per-job overhead dominate (measured 102 s
    for 5 rounds on a 2.56M-node graph at local[32] vs ~15 s lazy);
    ``checkpoint_every`` bounds plan depth for deep runs.
    """
    # out-degree folded onto the edge list ONCE; the per-round join then
    # carries (src, dst, outdeg) and never recomputes degrees
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges_d = edges.join(deg, "src").localCheckpoint(eager=True)

    verts = nodes.select(F.col(id_col).alias("v")).localCheckpoint(eager=True)
    ranks = verts.select("v", F.lit(R0_MICRO).cast("long").alias("r"))
    for i in range(n_iter):
        ranks = pagerank_round(edges_d, verts, ranks)
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("v").alias(id_col), F.col("r").alias("rank_micro"))


def pagerank_round(edges_d: DataFrame, verts: DataFrame, ranks: DataFrame) -> DataFrame:
    """One exact rank round as a LAZY plan (factored out so the plan
    audit can assert the per-round join shapes without executing the
    checkpointed loop): equi-join edges⋈ranks on src, integer contrib
    agg on dst, left join back to the vertex set."""
    contrib = (
        edges_d.join(ranks, edges_d["src"] == ranks["v"])
        .select("dst", F.expr("r div outdeg").alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("in_c"))
    )
    return (
        verts.join(contrib, verts["v"] == contrib["dst"], "left")
        .select(
            "v",
            F.expr(
                f"CAST({TELEPORT_MICRO} + (85 * coalesce(in_c, 0)) div 100"
                " AS BIGINT)"
            ).alias("r"),
        )
    )


def pagerank_weighted(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "host",
    weight_col: str = "w",
    n_iter: int = 3,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Weighted integer PageRank over a CONTRACTED graph (e.g. the host
    graph from ``operators/links.host_edges``): edges carry a link
    multiplicity ``w``; each round node u sends ``w · (r div W_u)``
    along each edge, ``W_u`` its total outgoing weight.  Same micro-unit
    arithmetic and shuffle shape as :func:`pagerank` — exactness,
    teleport, and the unrolled-CTE mirror all carry over; the state and
    edge list are |hosts|-sized, which is the point of contracting
    before ranking."""
    wdeg = edges.groupBy("src").agg(F.sum(weight_col).alias("outw"))
    edges_d = edges.join(wdeg, "src").localCheckpoint(eager=True)
    verts = nodes.select(F.col(id_col).alias("v")).localCheckpoint(eager=True)
    ranks = verts.select("v", F.lit(R0_MICRO).cast("long").alias("r"))
    for i in range(n_iter):
        contrib = (
            edges_d.join(ranks, edges_d["src"] == ranks["v"])
            .select("dst", F.expr(f"{weight_col} * (r div outw)").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_c"))
        )
        ranks = verts.join(contrib, verts["v"] == contrib["dst"], "left").select(
            "v",
            F.expr(
                f"CAST({TELEPORT_MICRO} + (85 * coalesce(in_c, 0)) div 100"
                " AS BIGINT)"
            ).alias("r"),
        )
        # lazy round chaining (pagerank's loop hygiene); checkpoint only
        # to bound plan depth on deep runs
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("v").alias(id_col), F.col("r").alias("rank_micro"))


def pagerank_weighted_sql(
    verts_sql: str,
    edges_sql: str,
    id_col: str = "host",
    n_iter: int = 3,
) -> str:
    """DuckDB mirror of :func:`pagerank_weighted` (edges_sql must yield
    (src, dst, w); verts_sql one ``v`` column)."""
    ctes = [
        f"verts AS ({verts_sql})",
        f"e AS ({edges_sql})",
        "wdeg AS (SELECT src, sum(w) AS outw FROM e GROUP BY src)",
        "ed AS (SELECT e.src, e.dst, e.w, wdeg.outw FROM e JOIN wdeg USING (src))",
        f"r0 AS (SELECT v, CAST({R0_MICRO} AS BIGINT) AS r FROM verts)",
    ]
    prev = "r0"
    for i in range(1, n_iter + 1):
        ctes.append(
            f"c{i} AS (SELECT ed.dst, CAST(sum(ed.w * (ed_r.r // ed.outw)) AS BIGINT) AS in_c "
            f"FROM ed JOIN {prev} ed_r ON ed.src = ed_r.v GROUP BY ed.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT verts.v, CAST({TELEPORT_MICRO} + "
            f"(85 * coalesce(c{i}.in_c, 0)) // 100 AS BIGINT) AS r "
            f"FROM verts LEFT JOIN c{i} ON verts.v = c{i}.dst)"
        )
        prev = f"r{i}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT v AS {id_col}, r AS rank_micro FROM {prev}"
    )


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    n_iter: int = 3,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Kleinberg's HITS (hubs & authorities) as exact integer fixed
    point: ``(id_col, hub_micro, auth_micro)`` after ``n_iter`` rounds.

    Per round: ``auth'(v) = Σ_{(u,v)} hub(u)`` then rescaled to
    ``(auth' * 10^6) div max(auth')`` (max-norm instead of the classic
    L2 so every operation stays 64-bit integer and order-free);
    symmetrically for hubs against the fresh authorities.  Nodes
    outside the edge set settle at 0 via left joins.

    Scale shape: identical to :func:`pagerank` — two map-side-combined
    shuffles per round over the CHECKPOINTED edge list, state is one row
    per node; the max-norm scalar enters as a one-row broadcast (the
    bm25 corpus-stats pattern), NOT a driver collect, so the whole
    fixed-round run chains lazily into one Spark job (the collect-based
    loop needed an eager checkpoint per HALF-round: 6 barriers per
    3-iteration run); ``checkpoint_every`` bounds plan depth for deep
    runs.  Precondition: the graph has at least one edge (enforced with
    one cheap count on the checkpointed edge list — an empty graph
    would otherwise NULL-divide silently).
    """
    deg_src = edges.localCheckpoint(eager=True)
    if deg_src.limit(1).count() == 0:
        raise ValueError("HITS requires a graph with at least one edge")
    verts = nodes.select(F.col(id_col).alias("v")).localCheckpoint(eager=True)
    hub = verts.select("v", F.lit(R0_MICRO).cast("long").alias("h"))
    auth = verts.select("v", F.lit(R0_MICRO).cast("long").alias("a"))
    for i in range(n_iter):
        a_raw = (
            deg_src.join(hub, deg_src["src"] == hub["v"])
            .groupBy("dst")
            .agg(F.sum("h").alias("m"))
        )
        auth = _max_norm(verts, a_raw, "dst", "a")
        h_raw = (
            deg_src.join(auth, deg_src["dst"] == auth["v"])
            .groupBy("src")
            .agg(F.sum("a").alias("m"))
        )
        hub = _max_norm(verts, h_raw, "src", "h")
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            auth = auth.localCheckpoint(eager=True)
            hub = hub.localCheckpoint(eager=True)
    return (
        hub.join(auth, "v")
        .select(
            F.col("v").alias(id_col),
            F.col("h").alias("hub_micro"),
            F.col("a").alias("auth_micro"),
        )
    )


def _max_norm(verts: DataFrame, raw: DataFrame, key: str, out: str) -> DataFrame:
    """(mass * 10^6) div max(mass), 0 for vertices with no mass — the
    max enters as a LAZY one-row broadcast so the caller's rounds can
    chain into a single job."""
    mx = raw.agg(F.max("m").alias("_mx"))
    return (
        verts.join(raw, verts["v"] == raw[key], "left")
        .crossJoin(F.broadcast(mx))
        .select(
            "v",
            F.expr(
                f"CAST((coalesce(m, 0) * {R0_MICRO}) div _mx AS BIGINT)"
            ).alias(out),
        )
    )


def hits_sql(
    rel: str,
    edges_sql: str,
    id_col: str = "doc_id",
    n_iter: int = 3,
) -> str:
    """DuckDB mirror of :func:`hits`: unrolled rounds, scalar-subquery
    max-norms, same integer arithmetic."""
    ctes = [
        f"verts AS (SELECT {id_col} AS v FROM {rel})",
        f"e AS ({edges_sql})",
        f"h0 AS (SELECT v, CAST({R0_MICRO} AS BIGINT) AS h FROM verts)",
    ]
    ph = "h0"
    pa = None
    for i in range(1, n_iter + 1):
        ctes.append(
            f"ar{i} AS (SELECT e.dst, CAST(sum({ph}.h) AS BIGINT) AS m "
            f"FROM e JOIN {ph} ON e.src = {ph}.v GROUP BY e.dst)"
        )
        ctes.append(
            f"a{i} AS (SELECT verts.v, CAST((coalesce(ar{i}.m, 0) * {R0_MICRO}) "
            f"// (SELECT max(m) FROM ar{i}) AS BIGINT) AS a "
            f"FROM verts LEFT JOIN ar{i} ON verts.v = ar{i}.dst)"
        )
        ctes.append(
            f"hr{i} AS (SELECT e.src, CAST(sum(a{i}.a) AS BIGINT) AS m "
            f"FROM e JOIN a{i} ON e.dst = a{i}.v GROUP BY e.src)"
        )
        ctes.append(
            f"h{i} AS (SELECT verts.v, CAST((coalesce(hr{i}.m, 0) * {R0_MICRO}) "
            f"// (SELECT max(m) FROM hr{i}) AS BIGINT) AS h "
            f"FROM verts LEFT JOIN hr{i} ON verts.v = hr{i}.src)"
        )
        ph, pa = f"h{i}", f"a{i}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT {ph}.v AS {id_col}, {ph}.h AS hub_micro, {pa}.a AS auth_micro"
        + f"\nFROM {ph} JOIN {pa} ON {ph}.v = {pa}.v"
    )


def pagerank_sql(
    rel: str,
    edges_sql: str,
    id_col: str = "doc_id",
    n_iter: int = 5,
) -> str:
    """DuckDB mirror: the same rounds unrolled as chained CTEs with the
    same integer arithmetic (DuckDB ``//`` on BIGINT ≡ Spark ``div``
    for the non-negative operands here)."""
    ctes = [
        f"verts AS (SELECT {id_col} AS v FROM {rel})",
        f"e AS ({edges_sql})",
        "deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)",
        "ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src))",
        f"r0 AS (SELECT v, CAST({R0_MICRO} AS BIGINT) AS r FROM verts)",
    ]
    prev = "r0"
    for i in range(1, n_iter + 1):
        ctes.append(
            f"c{i} AS (SELECT ed.dst, CAST(sum(ed_r.r // ed.outdeg) AS BIGINT) AS in_c "
            f"FROM ed JOIN {prev} ed_r ON ed.src = ed_r.v GROUP BY ed.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT verts.v, CAST({TELEPORT_MICRO} + "
            f"(85 * coalesce(c{i}.in_c, 0)) // 100 AS BIGINT) AS r "
            f"FROM verts LEFT JOIN c{i} ON verts.v = c{i}.dst)"
        )
        prev = f"r{i}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT v AS {id_col}, r AS rank_micro FROM {prev}"
    )


# ---------------------------------------------------------------- label
# propagation communities (deterministic synchronous LPA).  Community
# detection over the link graph is the spam-cluster / link-farm signal a
# crawl pipeline runs beside PageRank: dense near-cliques converge to
# one label in a round or two, while PageRank only says "popular".
#
# The classic LPA tie-rule is random; this variant is fully
# deterministic so a DuckDB oracle can unroll it: every node starts
# labeled with its own id, and each synchronous round adopts the most
# frequent label among its UNDIRECTED neighbors (both edge directions,
# multi-edges counted with multiplicity), ties broken by the SMALLEST
# label; isolated nodes keep their label.  Fixed rounds (no convergence
# collect) — synchronous LPA can oscillate on bipartite structure, which
# a fixed round count renders harmless and bit-reproducible.
#
# Scale shape per round: one edges⋈labels equi-join shuffle, one
# map-side-combinable (node, label) count, one per-node top-1 window on
# the counted (node, label) rows — all |E|-sized; text/html never enters.


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    n_iter: int = 4,
    checkpoint_every: int = 8,
) -> DataFrame:
    """(id_col, community) after ``n_iter`` deterministic LPA rounds.

    Rounds chain LAZILY (one Spark job at the end — measured 5x faster
    than per-round eager checkpoints at 4 rounds, where fixed per-job
    overhead dominated); ``checkpoint_every`` bounds plan depth for
    deep runs, matching the CC/PageRank loop hygiene."""
    und = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    verts = nodes.select(F.col(id_col).alias("v"))
    labels = verts.select("v", F.col("v").alias("lbl"))
    for i in range(n_iter):
        labels = lpa_round(und, verts, labels)
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            labels = labels.localCheckpoint(eager=True)
    return labels.select(F.col("v").alias(id_col), F.col("lbl").alias("community"))


def lpa_round(und: DataFrame, verts: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous LPA round as a lazy plan (factored for the plan
    audit): neighbor labels via the edge join, one map-side-combinable
    (node, label) count, then the deterministic top-1 as a second
    combinable agg — ``max_by`` over the orderable struct (count,
    -label) implements count-DESC/label-ASC without a sort window.
    Isolated nodes keep their previous label via the left join back to
    the vertex set."""
    neigh = (
        und.join(labels, und["dst"] == labels["v"])
        .select(und["src"].alias("node"), "lbl")
        .groupBy("node", "lbl")
        .agg(F.count("*").alias("cnt"))
    )
    top = neigh.groupBy("node").agg(
        F.expr("max_by(lbl, named_struct('c', cnt, 'nl', -lbl))").alias("new_lbl")
    )
    prev = labels.select(F.col("v").alias("_pv"), F.col("lbl").alias("_plbl"))
    return (
        verts.join(top, verts["v"] == top["node"], "left")
        .join(prev, verts["v"] == F.col("_pv"))
        .select("v", F.coalesce("new_lbl", "_plbl").alias("lbl"))
    )


def label_propagation_sql(
    rel: str, id_col: str = "doc_id", n: int | str = 0, n_iter: int = 4
) -> str:
    """DuckDB mirror: ``n_iter`` unrolled CTE rounds of the identical
    deterministic rule over the same law edges."""
    und = f"""
        und AS (
          SELECT src, dst FROM e
          UNION ALL
          SELECT dst AS src, src AS dst FROM e
        )"""
    rounds = []
    for i in range(n_iter):
        prev = f"l{i}"
        rounds.append(f"""
        c{i + 1} AS (
          SELECT und.src AS node, {prev}.lbl AS lbl, count(*) AS cnt
          FROM und JOIN {prev} ON und.dst = {prev}.node
          GROUP BY und.src, {prev}.lbl
        ),
        t{i + 1} AS (
          SELECT node, lbl
          FROM (SELECT node, lbl,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY cnt DESC, lbl ASC) AS rn
                FROM c{i + 1})
          WHERE rn = 1
        ),
        l{i + 1} AS (
          SELECT l.node, coalesce(t.lbl, l.lbl) AS lbl
          FROM l{i} l LEFT JOIN t{i + 1} t ON l.node = t.node
        )""")
    return f"""
        WITH e AS ({link_edges_sql(rel, id_col, n)}),
        {und},
        l0 AS (SELECT {id_col} AS node, {id_col} AS lbl FROM {rel}),
        {",".join(rounds)}
        SELECT node AS {id_col}, lbl AS community FROM l{n_iter}
    """


def triangle_counts(
    nodes: DataFrame, edges: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-vertex triangle counts ``(id_col, triangles)`` over the
    UNDIRECTED simple graph induced by ``edges`` (self-loops dropped,
    parallel/reverse duplicates collapsed) — the clustering/link-farm
    density signal beside PageRank and LPA.

    Scale shape (the standard degree-ordered wedge algorithm,
    cf. Suri & Vassilvitskii WWW'11 / Cohen's MapReduce formulation):

    * the simple edge set ``(lo, hi)`` is one dedup shuffle off the raw
      edges (only 16-byte id pairs shuffle, text never enters);
    * every edge is ORIENTED from its lower-(degree, id) endpoint to the
      higher one, so a vertex's oriented out-degree is bounded by
      O(sqrt(m)) on any graph (arboricity bound) — the wedge self-join
      below is therefore Σ d_out(v)² = O(m^1.5) pairs worst case
      instead of Σ d(v)² (which a hot hub makes quadratic: a 10^7-degree
      celebrity page would otherwise emit 10^14 wedges);
    * wedges (a→b, a→c) close into triangles via ONE equi-join against
      the oriented edge list on the (b, c) pair — an equi-join, not a
      containment probe, so Catalyst plans an ordinary shuffled hash
      join keyed by the pair;
    * per-vertex counts: each triangle scatters 3 (vertex, 1) rows into
      a map-side-combinable sum; vertices in no triangle settle at 0 via
      the left join back to the vertex set.

    The reference (sgis) has no graph layer; this extends the engine's
    crawl-graph family.  Oracle: INDEPENDENT id-ordered brute
    three-way-join enumeration (no degree orientation) in pure SQL —
    see ``triangle_counts_sql``.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    # degree over the simple graph
    deg = (
        und.select(F.col("lo").alias("v"))
        .unionByName(und.select(F.col("hi").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    dlo = deg.select(F.col("v").alias("lo"), F.col("d").alias("dlo"))
    dhi = deg.select(F.col("v").alias("hi"), F.col("d").alias("dhi"))
    # orient each edge from the smaller (degree, id) endpoint to the larger
    oriented = (
        und.join(dlo, "lo")
        .join(dhi, "hi")
        .select(
            F.when(
                (F.col("dlo") < F.col("dhi"))
                | ((F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))),
                F.struct(F.col("lo").alias("s"), F.col("hi").alias("t")),
            )
            .otherwise(F.struct(F.col("hi").alias("s"), F.col("lo").alias("t")))
            .alias("e")
        )
        .select(F.col("e.s").alias("s"), F.col("e.t").alias("t"))
        .localCheckpoint(eager=True)
    )
    w1 = oriented.select(F.col("s").alias("a"), F.col("t").alias("b"))
    w2 = oriented.select(F.col("s").alias("a2"), F.col("t").alias("c"))
    # wedges at the low-order apex a; b != c halves kept by b < c on the
    # ORIENTATION-independent id order is wrong here (closure edge may be
    # oriented either way between b and c), so keep both wedge orders and
    # close against the oriented edge (b, c) — each triangle then closes
    # exactly once because exactly ONE of its three vertex orders has
    # both wedge legs out of the apex AND the closing edge oriented b→c.
    tris = (
        w1.join(w2, F.col("a") == F.col("a2"))
        .filter(F.col("b") != F.col("c"))
        .select("a", "b", "c")
        .join(
            oriented.select(F.col("s").alias("b"), F.col("t").alias("c")),
            ["b", "c"],
        )
    )
    per_v = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("triangles"))
    )
    verts = nodes.select(F.col(id_col).alias("v"))
    return (
        verts.join(per_v, "v", "left")
        .select(
            F.col("v").alias(id_col),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
        )
    )


def triangle_counts_sql(rel: str, id_col: str = "doc_id", n: int | str = 0) -> str:
    """INDEPENDENT DuckDB oracle for :func:`triangle_counts`: id-ordered
    brute enumeration — triangles are (a < b < c) closed id-triples over
    the simple undirected edge set, one three-way self-join, NO degree
    orientation anywhere (the engine's arboricity trick is not shared)."""
    return f"""
    WITH e0 AS ({link_edges_sql(rel, id_col, n)}),
    und AS (
      SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
      FROM e0 WHERE src <> dst
    ),
    tri AS (
      SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      FROM und e1
      JOIN und e2 ON e2.lo = e1.hi
      JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    ),
    per_v AS (
      SELECT v, count(*) AS t FROM (
        SELECT a AS v FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY v
    )
    SELECT r.{id_col} AS {id_col},
           CAST(coalesce(per_v.t, 0) AS BIGINT) AS triangles
    FROM {rel} r LEFT JOIN per_v ON r.{id_col} = per_v.v
    """


def pagerank_seeded(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    id_col: str = "doc_id",
    n_iter: int = 5,
    checkpoint_every: int = 8,
) -> DataFrame:
    """TrustRank / personalized PageRank: teleport mass flows ONLY to the
    seed set (Gyöngyi-Garcia-Molina-Pedersen VLDB'04 — the web-spam
    demotion / crawl-seed-expansion primitive beside the uniform
    :func:`pagerank`).  ``seeds`` is a one-column frame of trusted ids;
    per round ``r' = (seed ? TELEPORT : 0) + (85 · Σ r div outdeg) div
    100`` with ranks seeded at ``R0`` on seeds and 0 elsewhere — all
    64-bit integer micro-units, so the rounds mirror into unrolled
    DuckDB CTEs bit-for-bit.  Pages unreachable from any seed settle at
    EXACTLY 0 (the spam signal).  Same lazy-chained loop and shuffle
    shape as :func:`pagerank`; the seed flag rides the checkpointed
    vertex table, adding nothing to the per-round shuffles."""
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges_d = edges.join(deg, "src").localCheckpoint(eager=True)
    verts = (
        nodes.select(F.col(id_col).alias("v"))
        .join(
            seeds.selectExpr(f"{seeds.columns[0]} as v").withColumn(
                "_s", F.lit(1)
            ),
            "v",
            "left",
        )
        .select("v", F.coalesce("_s", F.lit(0)).cast("long").alias("is_seed"))
        .localCheckpoint(eager=True)
    )
    ranks = verts.select(
        "v", (F.col("is_seed") * F.lit(R0_MICRO)).cast("long").alias("r")
    )
    for i in range(n_iter):
        contrib = (
            edges_d.join(ranks, edges_d["src"] == ranks["v"])
            .select("dst", F.expr("r div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_c"))
        )
        ranks = (
            verts.join(contrib, verts["v"] == contrib["dst"], "left")
            .select(
                "v",
                F.expr(
                    f"CAST(is_seed * {TELEPORT_MICRO}"
                    " + (85 * coalesce(in_c, 0)) div 100 AS BIGINT)"
                ).alias("r"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("v").alias(id_col), F.col("r").alias("trust_micro"))


def pagerank_seeded_sql(
    rel: str,
    seed_pred: str,
    id_col: str = "doc_id",
    n: int | str = 0,
    n_iter: int = 5,
) -> str:
    """DuckDB mirror of :func:`pagerank_seeded` over the law edge graph:
    ``seed_pred`` is a SQL boolean over ``{rel}`` rows selecting the
    trusted set (e.g. ``"doc_id % 100 = 0"``)."""
    ctes = [
        f"e AS ({link_edges_sql(rel, id_col, n)})",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY src)",
        "ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src))",
        f"verts AS (SELECT {id_col} AS v, CASE WHEN {seed_pred} THEN 1 ELSE 0 END AS is_seed FROM {rel})",
        f"r0 AS (SELECT v, CAST(is_seed * {R0_MICRO} AS BIGINT) AS r FROM verts)",
    ]
    prev = "r0"
    for i in range(1, n_iter + 1):
        ctes.append(
            f"c{i} AS (SELECT ed.dst, CAST(sum(r.r // ed.outdeg) AS BIGINT) AS in_c "
            f"FROM ed JOIN {prev} r ON ed.src = r.v GROUP BY ed.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT verts.v, CAST(verts.is_seed * {TELEPORT_MICRO}"
            f" + (85 * coalesce(c{i}.in_c, 0)) // 100 AS BIGINT) AS r"
            f" FROM verts LEFT JOIN c{i} ON verts.v = c{i}.dst)"
        )
        prev = f"r{i}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT v AS {id_col}, r AS trust_micro FROM {prev}"
    )


# walk-step mixing constants (same public Lehmer family as _A/_B; the mix
# only needs to be well-spread mod small out-degrees, not cryptographic)
_W1 = 48271
_W2 = 16807
_W3 = 69621


def random_walks(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    n_steps: int = 4,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Deterministic uniform random walks — the node2vec/DeepWalk corpus
    generator: one walk per row of ``nodes``, ``n_steps`` hops, output
    ``(walk_id, step, node)`` with ``walk_id`` the start node and
    ``step`` 0..n_steps.  "Random" is a HASH, not an RNG: at step t a
    walk standing on u takes the out-edge with deterministic index
    ``(u·W1 + t·W2 + walk_id·W3) % outdeg(u)`` among u's out-edges
    ranked by destination id — so both engines (and any two runs)
    produce the identical corpus, the property every reproducible
    embedding pipeline needs.  Walks STOP at dead ends (no out-edges):
    later steps simply emit no row.

    Works against ANY (src, dst) edge table (the rank index is built
    with one window over src), not just the closed-form law graph.

    Scale shape: the ranked edge list is built once and checkpointed
    (rank window = one shuffle on src); each step is ONE equi-join of
    the |walks|-sized position set against it on src (+ the rank
    filter), lazily chained like :func:`pagerank` — ``2·n_steps``
    narrow shuffles total, positions never exceed one row per walk.
    """
    w = Window.partitionBy("src").orderBy("dst")
    edges_r = (
        edges.select("src", "dst")
        .withColumn("erank", F.row_number().over(w).cast("long"))
        .withColumn("outdeg", F.count("*").over(Window.partitionBy("src")).cast("long"))
        .localCheckpoint(eager=True)
    )
    pos = nodes.select(
        F.col(id_col).alias("walk_id"),
        F.lit(0).cast("long").alias("step"),
        F.col(id_col).alias("node"),
    )
    out = pos
    for t in range(1, n_steps + 1):
        stepped = (
            pos.join(edges_r, pos["node"] == edges_r["src"])
            .filter(
                F.col("erank")
                == 1
                + F.pmod(
                    F.col("node") * _W1
                    + F.lit(t) * _W2
                    + F.col("walk_id") * _W3,
                    F.col("outdeg"),
                )
            )
            .select(
                "walk_id", F.lit(t).cast("long").alias("step"), F.col("dst").alias("node")
            )
        )
        if t % checkpoint_every == 0 and t < n_steps:
            stepped = stepped.localCheckpoint(eager=True)
        out = out.unionByName(stepped)
        pos = stepped
    return out


def random_walks_sql(
    rel: str,
    id_col: str = "doc_id",
    n: int | str = 0,
    n_steps: int = 4,
) -> str:
    """DuckDB mirror of :func:`random_walks` over the law edge graph:
    unrolled step CTEs of the identical ranked-edge/hash-index rule."""
    ctes = [
        f"e AS ({link_edges_sql(rel, id_col, n)})",
        """er AS (
          SELECT src, dst,
                 CAST(row_number() OVER (PARTITION BY src ORDER BY dst) AS BIGINT) AS erank,
                 CAST(count(*) OVER (PARTITION BY src) AS BIGINT) AS outdeg
          FROM e
        )""",
        f"p0 AS (SELECT {id_col} AS walk_id, CAST(0 AS BIGINT) AS step, {id_col} AS node FROM {rel})",
    ]
    for t in range(1, n_steps + 1):
        ctes.append(
            f"""p{t} AS (
              SELECT p.walk_id, CAST({t} AS BIGINT) AS step, er.dst AS node
              FROM p{t - 1} p JOIN er ON er.src = p.node
              WHERE er.erank = 1 + ((p.node * {_W1} + {t} * {_W2}
                                     + p.walk_id * {_W3}) % er.outdeg
                                    + er.outdeg) % er.outdeg
            )"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT walk_id, step, node FROM p{t}" for t in range(n_steps + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union
