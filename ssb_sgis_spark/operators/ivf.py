"""IVF (inverted-file) approximate nearest neighbor — the k-means
coarse-quantizer scale path, complementing the LSH path in
:mod:`.ann`.

Shape at 10^12 rows:

* **Train** — distributed Lloyd's k-means over the embedding column:
  assignment is one Arrow-batched ``(B, dim) @ (dim, C)`` matmul per
  batch against broadcast centroids; the update step is a map-side
  partial (per-partition sum + count per centroid) followed by one tiny
  ``groupBy(centroid)`` combine — the classic two-stage aggregation, no
  driver-side data beyond the ``(C, dim)`` centroid matrix itself.
* **Index** — every corpus row gets its nearest centroid id
  (``_cid``); that column IS the posting-list partition key.
* **Probe** — each query scores the centroid matrix (driver-free,
  same Arrow kernel), takes its ``n_probe`` closest centroids, explodes,
  and equi-joins the posting lists on ``_cid`` — touching
  ~``n_probe/C`` of the corpus instead of all of it; candidates are
  rescored with exact cosine and a window takes top-k.

Determinism: centroid init picks the ``n_centroids`` corpus rows with
the smallest ``xxhash64(id)`` (seeded), assignment ties break to the
lowest centroid id, and Lloyd runs a FIXED ``n_iter`` rounds (no
data-dependent early exit), so the index is reproducible run-to-run.
``n_probe == n_centroids`` degenerates to exact brute force — the
recall tests pin that invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .ann import _as_double, cos_batch_udf


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _assign_udf(centroids: np.ndarray):
    """Arrow-batched nearest-centroid id (cosine; ties -> lowest cid)."""
    cn = _normalize(centroids).T.copy()  # (dim, C)

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        m = _normalize(np.vstack(v.to_numpy()))
        sims = m @ cn
        # argmax with lowest-index tie-break (np.argmax already does)
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    return assign


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 64,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> np.ndarray:
    """(C, dim) float64 centroid matrix via distributed Lloyd's."""
    c = corpus.select(
        F.col(id_col).alias("_vid"), _as_double(F.col(vec_col)).alias("_v")
    )
    # deterministic seeded init: rows with the smallest hash of (seed, id)
    init = (
        c.withColumn("_h", F.xxhash64(F.lit(seed), F.col("_vid")))
        .orderBy("_h", "_vid")
        .limit(n_centroids)
        .collect()
    )
    centroids = np.vstack([np.asarray(r["_v"], dtype=np.float64) for r in init])

    for _ in range(n_iter):
        assign = _assign_udf(centroids)
        dim = centroids.shape[1]
        ncen = centroids.shape[0]

        def partial(it):
            # map-side combine: per-partition (cid, count, sum-vector)
            for pdf in it:
                if not len(pdf):
                    continue
                m = np.vstack(pdf["_v"].to_numpy())
                cid = pdf["_cid"].to_numpy()
                out = []
                for u in np.unique(cid):
                    sel = m[cid == u]
                    out.append((int(u), len(sel), sel.sum(axis=0).tolist()))
                yield pd.DataFrame(out, columns=["_cid", "_n", "_sum"])

        parts = (
            c.withColumn("_cid", assign(F.col("_v")))
            .mapInPandas(partial, schema="_cid int, _n long, _sum array<double>")
            .groupBy("_cid")
            .agg(
                F.sum("_n").alias("n"),
                F.array(
                    *[F.sum(F.col("_sum")[i]).alias(f"s{i}") for i in range(dim)]
                ).alias("s"),
            )
            .collect()
        )
        new = centroids.copy()  # empty centroids keep their position
        for r in parts:
            if r["n"]:
                new[r["_cid"]] = np.asarray(r["s"], dtype=np.float64) / r["n"]
        centroids = new
    return centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "qid",
    corpus_id: str = "vid",
    vec_col: str = "embedding",
    n_centroids: int = 64,
    n_probe: int = 8,
    n_iter: int = 5,
    seed: int = 7,
    centroids: np.ndarray | None = None,
    corpus_filter=None,
) -> DataFrame:
    """(qid, vid, rank): cosine top-k via IVF posting lists.  Pass a
    pre-trained ``centroids`` matrix to reuse an index across query
    batches (the production pattern — train once, probe forever).

    ``corpus_filter`` (a boolean Column) is PRE-FILTERED vector search:
    the predicate restricts the posting lists BEFORE scoring, so top-k
    is exact over the metadata-matching subset — the correct semantics
    when a filter is selective (post-filtering a k-list can return fewer
    than k, or none, for a rare label).  Catalyst pushes the predicate
    into the posting scan; centroids are trained on the UNFILTERED
    corpus so one index serves every filter."""
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids, n_iter, corpus_id, vec_col, seed
        )
    if corpus_filter is not None:
        corpus = corpus.filter(corpus_filter)
    n_probe = min(n_probe, centroids.shape[0])
    assign = _assign_udf(centroids)
    cn = _normalize(centroids).T.copy()

    posted = corpus.select(
        F.col(corpus_id).alias("vid"), _as_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_cid", assign(F.col("_cv")))

    @F.pandas_udf("array<int>")
    def probe(v: pd.Series) -> pd.Series:
        m = _normalize(np.vstack(v.to_numpy()))
        sims = m @ cn
        # n_probe highest-sim centroids, deterministic order
        order = np.argsort(-sims, kind="stable", axis=1)[:, :n_probe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    q = queries.select(
        F.col(query_id).alias("qid"), _as_double(F.col(vec_col)).alias("_qv")
    ).withColumn("_cid", F.explode(probe(F.col("_qv"))))

    _cos = cos_batch_udf()
    scored = posted.join(F.broadcast(q), "_cid").select(
        "qid", "vid", _cos(F.col("_qv"), F.col("_cv")).alias("_cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("_cos"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vid", F.col("rank").cast("int").alias("rank"))
    )


# ---------------------------------------------------------------- persisted
# The production ANN lifecycle: the index is a LAKE ARTIFACT, not a
# per-job recomputation.  ``build_ivf_index`` trains once and writes two
# tables under one root —
#
#   <root>/centroids   (cid int, vec array<double>)           C rows
#   <root>/postings    (vid, _cv array<double>, _cid int)     corpus rows,
#                                                PARTITIONED BY _cid
#
# — so a probe is a PARTITION-PRUNED scan: the probed cid set becomes a
# literal ``isin`` filter that reaches the reader as PartitionFilters,
# and only ~n_probe/C of the corpus bytes are read from storage (the
# same pruning story as lake_pip's cell partitions).  New embeddings
# append through the FROZEN centroids (``append_ivf_index``) — the
# standard IVF incremental pattern (FAISS ``add`` after ``train``), and
# the same persisted-old-side shape as ``dedup_against``.  Re-training
# is an explicit rebuild, never implicit.


def build_ivf_index(
    corpus: DataFrame,
    root: str,
    n_centroids: int = 64,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> np.ndarray:
    """Train centroids on ``corpus``, write the centroid + posting-list
    lake tables under ``root`` (overwrite), return the centroid matrix."""
    from ..sources.io import write_lake_table

    centroids = train_ivf_centroids(
        corpus, n_centroids, n_iter, id_col, vec_col, seed
    )
    spark = corpus.sparkSession
    cent_rows = [
        (int(i), [float(x) for x in centroids[i]])
        for i in range(centroids.shape[0])
    ]
    write_lake_table(
        spark.createDataFrame(cent_rows, "cid int, vec array<double>"),
        f"{root}/centroids",
        mode="overwrite",
    )
    assign = _assign_udf(centroids)
    posted = corpus.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_cid", assign(F.col("_cv")))
    write_lake_table(
        posted, f"{root}/postings", mode="overwrite", partition_by=["_cid"]
    )
    return centroids


def load_ivf_centroids(spark, root: str) -> np.ndarray:
    """(C, dim) matrix from the persisted centroid table (C rows — the
    only driver-side materialization in the probe path)."""
    from ..sources.io import read_lake_table

    rows = read_lake_table(spark, f"{root}/centroids").collect()
    rows.sort(key=lambda r: r["cid"])
    return np.vstack([np.asarray(r["vec"], dtype=np.float64) for r in rows])


def append_ivf_index(
    new_rows: DataFrame,
    root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Assign ``new_rows`` through the PERSISTED centroids (no retrain)
    and append to the posting lists — incremental ingest; each batch is
    one map-only job + an append commit."""
    from ..sources.io import write_lake_table

    centroids = load_ivf_centroids(new_rows.sparkSession, root)
    assign = _assign_udf(centroids)
    posted = new_rows.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_cid", assign(F.col("_cv")))
    write_lake_table(
        posted, f"{root}/postings", mode="append", partition_by=["_cid"]
    )


def ivf_topk_indexed(
    queries: DataFrame,
    root: str,
    k: int,
    query_id: str = "qid",
    vec_col: str = "embedding",
    n_probe: int = 8,
) -> DataFrame:
    """(qid, vid, rank) scored FROM the persisted index.  The union of
    probed centroid ids across the query batch (≤ n_queries × n_probe
    ints — the query side is small by definition of retrieval) becomes a
    literal partition filter on the posting-list scan, so storage reads
    only the probed partitions.  Identical semantics to :func:`ivf_topk`
    with the same centroids."""
    from ..sources.io import read_lake_table

    spark = queries.sparkSession
    centroids = load_ivf_centroids(spark, root)
    n_probe = min(n_probe, centroids.shape[0])
    cn = _normalize(centroids).T.copy()

    @F.pandas_udf("array<int>")
    def probe(v: pd.Series) -> pd.Series:
        m = _normalize(np.vstack(v.to_numpy()))
        sims = m @ cn
        order = np.argsort(-sims, kind="stable", axis=1)[:, :n_probe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    q = (
        queries.select(
            F.col(query_id).alias("qid"), _as_double(F.col(vec_col)).alias("_qv")
        )
        .withColumn("_cid", F.explode(probe(F.col("_qv"))))
        .persist()
    )
    probed = sorted({r["_cid"] for r in q.select("_cid").distinct().collect()})

    posted = read_lake_table(spark, f"{root}/postings").filter(
        F.col("_cid").isin(probed)  # -> PartitionFilters on the scan
    )
    _cos = cos_batch_udf()
    scored = posted.join(F.broadcast(q), "_cid").select(
        "qid", "vid", _cos(F.col("_qv"), F.col("_cv")).alias("_cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("_cos"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vid", F.col("rank").cast("int").alias("rank"))
    )
