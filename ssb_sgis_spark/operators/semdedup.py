"""SemDeDup — semantic deduplication via embedding clusters.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication") prune web corpora by (1) k-means
clustering the document embeddings, (2) comparing pairs ONLY within a
cluster, and (3) keeping one representative from every group of
semantically near-identical documents.  The clustering is what makes the
pairwise step tractable: at 10^12 documents the all-pairs matrix is
unthinkable, but within-cluster pairs are ``O(n^2 / k)`` and each
cluster is an independent task.

This implementation makes every step **bit-exact cross-engine** so the
whole pipeline has a DuckDB oracle (the same discipline as ``pagerank``'s
unrolled rounds):

* Embeddings are int8-quantized on the unit sphere first
  (:func:`~.ann.quantize_int8` — ``round(127 * x / ||x||)``, already
  oracle-proven by the ``ann_quant`` driver query), then unpacked into
  ``dim`` scalar BIGINT columns so every downstream expression is plain
  scalar SQL shared verbatim by Spark (``F.expr``) and DuckDB.
* K-means state stays INTEGER: a centroid is ``(n, s_1..s_dim)`` — the
  member count and the elementwise code sums — so the update aggregation
  is order-independent 64-bit arithmetic (a float mean would depend on
  Spark's partial-agg order).  The assignment distance to centroid
  ``S/n`` is compared through the exact-integer numerator
  ``num = sum_i (q_i * n - s_i)^2`` as ``CAST(num AS DOUBLE) /
  CAST(n * n AS DOUBLE)`` — one correctly-rounded division of exact
  integers, identical in both engines; ties break to the lowest
  centroid id.  Overflow envelope: ``num <= dim * (254)^2 * n^2`` needs
  cluster sizes under ~1.5e6 at dim=64; shard k upward before that.
* Init is deterministic: the ``k`` smallest ids seed the centroids
  (``TakeOrderedAndProject`` — top-k per partition + driver merge, no
  global sort), and Lloyd runs a FIXED ``n_iter`` assignment rounds
  (``n_iter - 1`` updates), unrolled as CTEs in the mirror.
* The near-dup rule is integer too: ``b`` is a duplicate of some
  earlier ``a`` in the same cluster when ``dot(q_a, q_b) > 0`` and
  ``t_den^2 * dot^2 >= t_num^2 * ||q_a||^2 * ||q_b||^2`` — the
  cross-multiplied form of ``cos >= t_num/t_den`` over the quantized
  codes, no float division anywhere.

Scale shape: quantize/unpack is map-only; each assignment round is a
broadcast of the k-row centroid table across the points (the IVF-train
layout — ``ivf.py`` keeps the Arrow-matmul variant for k in the
thousands); the update is one ``groupBy(cid)`` with map-side combine;
the pairwise step is a self-equi-join ON THE CLUSTER KEY — never a
global cross join — and the keep rule is one LEFT JOIN.

Reference parity: sgis has no embedding operators; this extends the
dedup family (``dedup.py``, ``ann.py``) the north star's training-data
pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .ann import quantize_int8

__all__ = ["semdedup", "semdedup_sql"]


def _dist_sql(dim: int) -> str:
    """Shared scalar text: squared distance from point (q1..qdim) to
    centroid (n, s1..sdim), scaled by n^2 — integer numerator, ONE
    double division."""
    num = " + ".join(
        f"(q{i} * n - s{i}) * (q{i} * n - s{i})" for i in range(1, dim + 1)
    )
    return f"(CAST({num} AS DOUBLE) / CAST(n * n AS DOUBLE))"


def _dot_sql(dim: int, a: str, b: str) -> str:
    return " + ".join(f"{a}.q{i} * {b}.q{i}" for i in range(1, dim + 1))


def _nrm2_sql(dim: int, a: str = "") -> str:
    p = f"{a}." if a else ""
    return " + ".join(f"{p}q{i} * {p}q{i}" for i in range(1, dim + 1))


def semdedup(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_clusters: int = 8,
    n_iter: int = 2,
    tau: tuple[int, int] = (3, 10),
    cluster_cap: int | None = 1_000_000,
) -> DataFrame:
    """Returns ``(vid, cid, keep)`` — every input row with its final
    cluster id and ``keep = False`` iff some SAME-CLUSTER row with a
    smaller id is within quantized-cosine ``tau[0]/tau[1]`` of it (the
    min-id representative of each near-dup set survives).

    ``cluster_cap`` is the skew policy (same rule as LSH
    ``bucket_cap``): within-cluster pairs are O(size^2), so a degenerate
    clustering — every embedding near one centroid — reverts to a global
    quadratic inside that cluster.  Clusters wider than the cap are
    EXCLUDED from pair generation (all their rows keep=True): at corpus
    scale that trades recall inside pathological clusters for a bounded
    task size, exactly the mega-bucket drop LSH applies.  Shard
    ``k_clusters`` upward (SemDeDup uses ~100k clusters at web scale) so
    real clusters never hit the cap; ``None`` disables the guard."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    qq = quantize_int8(F.col(vec_col))
    pts = df.select(
        F.col(id_col).alias("vid"),
        *[F.element_at(qq, i).alias(f"q{i}") for i in range(1, dim + 1)],
    )
    seeds = pts.orderBy("vid").limit(int(k_clusters))
    cent = seeds.select(
        F.col("vid").alias("cid"),
        F.lit(1).cast("long").alias("n"),
        *[F.col(f"q{i}").alias(f"s{i}") for i in range(1, dim + 1)],
    )
    dist = F.expr(_dist_sql(dim))
    w = Window.partitionBy("vid").orderBy(F.col("_dist").asc(), F.col("cid").asc())
    assign = None
    for r in range(int(n_iter)):
        assign = (
            pts.crossJoin(F.broadcast(cent))
            .withColumn("_dist", dist)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_dist", "_rn", "n", *[f"s{i}" for i in range(1, dim + 1)])
        )
        if r < n_iter - 1:
            cent = assign.groupBy("cid").agg(
                F.count("*").cast("long").alias("n"),
                *[F.sum(f"q{i}").alias(f"s{i}") for i in range(1, dim + 1)],
            )
    t_num, t_den = int(tau[0]), int(tau[1])
    # the final assignment feeds THREE consumers (both pair-join sides
    # and the output row set); persist it so the Lloyd chain executes
    # once, spilling to disk when the corpus outgrows executor memory
    # (lazy — nothing runs until the caller acts)
    from pyspark import StorageLevel

    assign = assign.persist(StorageLevel.MEMORY_AND_DISK)
    # norms once per ROW (before the pair blow-up), dot once per PAIR:
    # the equi-join key is the cluster id, the dot/threshold compare is
    # a post-join projection + filter, never re-evaluated in the
    # condition tree
    m = assign.withColumn("_nrm2", F.expr(_nrm2_sql(dim)))
    if cluster_cap is not None:
        # k_clusters-row side, broadcast: only rows in clusters at or
        # under the cap enter the O(size^2) pair join; oversized-cluster
        # rows skip straight to the output with keep=True
        ok = (
            assign.groupBy("cid")
            .agg(F.count("*").alias("_csz"))
            .filter(F.col("_csz") <= int(cluster_cap))
            .select("cid")
        )
        m = m.join(F.broadcast(ok), "cid")
    a, b = m.alias("a"), m.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cid") == F.col("b.cid")) & (F.col("a.vid") < F.col("b.vid")),
    ).select(
        F.col("b.vid").alias("_dup"),
        F.expr(_dot_sql(dim, "a", "b")).alias("_dot"),
        (F.col("a._nrm2") * F.col("b._nrm2")).alias("_nn"),
    )
    dups = (
        pairs.filter(
            (F.col("_dot") > 0)
            & (
                F.lit(t_den * t_den) * F.col("_dot") * F.col("_dot")
                >= F.lit(t_num * t_num) * F.col("_nn")
            )
        )
        .select("_dup")
        .distinct()
    )
    return (
        assign.join(dups, assign["vid"] == dups["_dup"], "left")
        .select("vid", "cid", F.col("_dup").isNull().alias("keep"))
    )


def semdedup_sql(
    rel: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_clusters: int = 8,
    n_iter: int = 2,
    tau: tuple[int, int] = (3, 10),
) -> str:
    """DuckDB mirror: identical quantization, unrolled Lloyd rounds,
    identical integer dup rule."""
    nrm = (
        f"sqrt(list_dot_product(CAST({vec_col} AS DOUBLE[]), "
        f"CAST({vec_col} AS DOUBLE[])))"
    )
    qcols = ",\n           ".join(
        f"CASE WHEN {nrm} = 0.0 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(round(127.0 * (CAST({vec_col}[{i}] AS DOUBLE) / {nrm})) "
        f"AS BIGINT) END AS q{i}"
        for i in range(1, dim + 1)
    )
    qs = ", ".join(f"q{i}" for i in range(1, dim + 1))
    pqs = ", ".join(f"p.q{i}" for i in range(1, dim + 1))
    t_num, t_den = int(tau[0]), int(tau[1])
    ctes = [
        f"pts AS (\n  SELECT {id_col} AS vid,\n           {qcols}\n  FROM {rel}\n)",
        f"seeds AS (SELECT * FROM pts ORDER BY vid LIMIT {int(k_clusters)})",
        "c0 AS (SELECT vid AS cid, CAST(1 AS BIGINT) AS n, "
        + ", ".join(f"q{i} AS s{i}" for i in range(1, dim + 1))
        + " FROM seeds)",
    ]
    for r in range(int(n_iter)):
        ctes.append(
            f"""a{r + 1} AS (
  SELECT vid, cid, {qs} FROM (
    SELECT p.vid, c.cid, {pqs},
           row_number() OVER (
             PARTITION BY p.vid ORDER BY {_dist_sql(dim)}, c.cid
           ) AS rn
    FROM pts p CROSS JOIN c{r} c
  ) WHERE rn = 1
)"""
        )
        if r < n_iter - 1:
            sums = ", ".join(
                f"CAST(sum(q{i}) AS BIGINT) AS s{i}" for i in range(1, dim + 1)
            )
            ctes.append(
                f"c{r + 1} AS (SELECT cid, CAST(count(*) AS BIGINT) AS n, "
                f"{sums} FROM a{r + 1} GROUP BY cid)"
            )
    final = f"a{int(n_iter)}"
    return f"""
    WITH {','.join(ctes)},
    nm AS (SELECT *, ({_nrm2_sql(dim)}) AS nrm2 FROM {final}),
    pairs AS (
      SELECT b.vid AS dup, ({_dot_sql(dim, 'a', 'b')}) AS dot,
             a.nrm2 * b.nrm2 AS nn
      FROM nm a JOIN nm b ON a.cid = b.cid AND a.vid < b.vid
    ),
    dups AS (
      SELECT DISTINCT dup AS vid FROM pairs
      WHERE dot > 0 AND {t_den * t_den} * dot * dot >= {t_num * t_num} * nn
    )
    SELECT m.vid, m.cid, d.vid IS NULL AS keep
    FROM {final} m LEFT JOIN dups d ON m.vid = d.vid
    """
