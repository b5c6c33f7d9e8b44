"""Approximate-nearest-neighbor search over embedding columns.

Two paths over the ``embeddings`` table (vec_id, embedding float[64],
label):

* :func:`cosine_topk` — brute-force cosine top-k: broadcast the (small)
  query set, score every corpus row with a native ``zip_with`` /
  ``aggregate`` dot product in DOUBLE (JVM-side, no Python), window
  top-k per query.  The exactness baseline and the oracle-checked path.
* :func:`ann_lsh_topk` — the scale path: random-hyperplane LSH.  Sign
  bits against ``n_planes`` fixed hyperplanes bucket the corpus; each
  query probes its own bucket (+ optional 1-bit-flip multiprobe).  At
  10^12 rows the corpus is hashed once (narrow, shuffle on bucket) and
  each query touches ~corpus/2^n_planes rows instead of everything.
  Verified by a pytest recall test against brute force — approximate by
  construction, so no SQL oracle.

Everything is deterministic: hyperplanes come from a seeded
RandomState and ties break on vec_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double dot product (index order matches the
    DuckDB ``list_dot_product`` mirror)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "qid",
    corpus_id: str = "vid",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, vid, rank) of the k highest-cosine corpus rows per query.
    Broadcast-queries × corpus, no shuffle except the final per-query
    top-k window (partitioned by qid — small)."""
    q = queries.select(
        F.col(query_id).alias("qid"), _as_double(F.col(vec_col)).alias("_qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("vid"), _as_double(F.col(vec_col)).alias("_cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid",
        "vid",
        (_dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv")))).alias(
            "_cos"
        ),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("_cos"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vid", F.col("rank").cast("int").alias("rank"))
    )


def cosine_topk_sql(
    queries_rel: str,
    corpus_rel: str,
    k: int,
    query_id: str = "qid",
    corpus_id: str = "vid",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror — double-cast lists, list_dot_product, same tie-break."""
    return f"""
    WITH scored AS (
      SELECT q.{query_id} AS qid, c.{corpus_id} AS vid,
             list_dot_product(CAST(q.{vec_col} AS DOUBLE[]), CAST(c.{vec_col} AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(q.{vec_col} AS DOUBLE[]), CAST(q.{vec_col} AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(c.{vec_col} AS DOUBLE[]), CAST(c.{vec_col} AS DOUBLE[]))))
             AS cos
      FROM {corpus_rel} c CROSS JOIN {queries_rel} q
    )
    SELECT qid, vid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS INTEGER) AS rank
    FROM scored QUALIFY rank <= {k}
    """


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def _bucket_col(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id against fixed hyperplanes — native expressions
    (one aggregate per plane over the array column).  Kept for low-dim /
    few-plane cases; the scale path is :func:`_bucket_udf`."""
    bits = []
    for i, p in enumerate(planes):
        lits = F.array(*[F.lit(float(v)) for v in p])
        d = _dot(vec, lits)
        bits.append(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def _bucket_udf(planes: np.ndarray):
    """Arrow-batched hyperplane bucketing: one numpy matmul per batch
    ((B, dim) @ (dim, n_planes)) instead of n_planes interpreted
    aggregate expressions per row — the high-dim scale path."""
    shifts = (1 << np.arange(planes.shape[0], dtype=np.int64))

    @F.pandas_udf("int")
    def bucket(v: pd.Series) -> pd.Series:
        m = np.vstack(v.to_numpy())
        bits = (m @ planes.T >= 0).astype(np.int64)
        return pd.Series((bits * shifts).sum(axis=1).astype(np.int32))

    return bucket


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "qid",
    corpus_id: str = "vid",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 7,
    multiprobe: int = 1,
) -> DataFrame:
    """Bucketed cosine top-k (random-hyperplane LSH).  Equi-join on the
    bucket id replaces the cross join; recall < 1 by design.

    ``multiprobe=1`` also probes every bucket at Hamming distance 1 from
    the query's bucket (n_planes+1 probes per query) — the standard
    recall/cost knob; a corpus vid lives in exactly one bucket so probes
    never duplicate candidates."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = _bucket_udf(planes)
    q = queries.select(
        F.col(query_id).alias("qid"), _as_double(F.col(vec_col)).alias("_qv")
    ).withColumn("_bucket", bucket(F.col("_qv")))
    if multiprobe >= 1:
        probes = F.array(
            F.col("_bucket"),
            *[F.col("_bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
        q = q.withColumn("_bucket", F.explode(probes))
    c = corpus.select(
        F.col(corpus_id).alias("vid"), _as_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_bucket", bucket(F.col("_cv")))

    # candidate rescoring as an Arrow-batched numpy kernel: the
    # aggregate/zip_with higher-order functions are CodegenFallback and
    # evaluate interpreted per element — a (B, dim) vectorized
    # dot/norm per batch replaces ~3*dim interpreted ops per candidate
    @F.pandas_udf("double")
    def _cos_batch(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.vstack(a.to_numpy())
        mb = np.vstack(b.to_numpy())
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.sqrt(np.einsum("ij,ij->i", ma, ma)) * np.sqrt(
            np.einsum("ij,ij->i", mb, mb)
        )
        return pd.Series(num / den)

    scored = c.join(F.broadcast(q), "_bucket").select(
        "qid",
        "vid",
        _cos_batch(F.col("_qv"), F.col("_cv")).alias("_cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("_cos"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vid", F.col("rank").cast("int").alias("rank"))
    )
