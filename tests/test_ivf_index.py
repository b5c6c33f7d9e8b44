"""Persisted IVF index (operators/ivf.py build/append/load/probe).

The production ANN lifecycle under test:

* the index is a lake artifact — probing the PERSISTED posting lists
  reproduces the in-memory operator exactly;
* full probe (n_probe == n_centroids) is brute-force-exact regardless
  of centroids, so build(A) + append(B) at full probe == rebuild(A∪B)
  at full probe == exact top-k — the append≡rebuild invariant;
* with the SAME frozen centroids, append-then-probe equals
  probe-over-the-union at ANY n_probe;
* the probe scan is real partition pruning (``PartitionFilters``), not
  a post-scan filter.
"""

import numpy as np
import pytest

from tests.conftest import spark  # noqa: F401

from ssb_sgis_spark.operators.ivf import (
    append_ivf_index,
    build_ivf_index,
    ivf_topk,
    ivf_topk_indexed,
    load_ivf_centroids,
)

DIM = 8
K = 5
NCEN = 8


def _emb(spark, lo, hi, seed=19):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(lo, hi):
        v = rng.normal(size=DIM)
        rows.append((int(i), [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def _queries(corpus, mod=17):
    from pyspark.sql import functions as F

    return corpus.filter(F.col("vec_id") % mod == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )


def _brute(corpus_rows, query_rows, k):
    ids = np.array([r["vec_id"] for r in corpus_rows])
    m = np.vstack([r["embedding"] for r in corpus_rows]).astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = set()
    for qr in query_rows:
        q = np.asarray(qr["embedding"], dtype=np.float64)
        q = q / np.linalg.norm(q)
        cos = mn @ q
        order = sorted(zip(-cos, ids))[:k]
        for rank, (_, vid) in enumerate(order, 1):
            out.add((qr["qid"], int(vid), rank))
    return out


def test_indexed_full_probe_is_exact_and_matches_in_memory(spark, tmp_path):
    corpus = _emb(spark, 0, 120)
    root = str(tmp_path / "ivf")
    build_ivf_index(corpus, root, n_centroids=NCEN, n_iter=3)
    q = _queries(corpus)
    got = {
        (r["qid"], r["vid"], r["rank"])
        for r in ivf_topk_indexed(q, root, K, n_probe=NCEN).collect()
    }
    assert got == _brute(corpus.collect(), q.collect(), K)
    cents = load_ivf_centroids(spark, root)
    mem = {
        (r["qid"], r["vid"], r["rank"])
        for r in ivf_topk(
            q, corpus, K, corpus_id="vec_id", n_probe=NCEN, centroids=cents
        ).collect()
    }
    assert got == mem


def test_append_equals_rebuild(spark, tmp_path):
    a = _emb(spark, 0, 90, seed=19)
    b = _emb(spark, 90, 130, seed=23)
    union = a.unionByName(b)
    q = _queries(union)

    # incremental: train on A, append B through the frozen centroids
    inc = str(tmp_path / "inc")
    build_ivf_index(a, inc, n_centroids=NCEN, n_iter=3)
    append_ivf_index(b, inc)

    # full probe: both equal exact brute force over A∪B
    got_inc = {
        (r["qid"], r["vid"], r["rank"])
        for r in ivf_topk_indexed(q, inc, K, n_probe=NCEN).collect()
    }
    reb = str(tmp_path / "reb")
    build_ivf_index(union, reb, n_centroids=NCEN, n_iter=3)
    got_reb = {
        (r["qid"], r["vid"], r["rank"])
        for r in ivf_topk_indexed(q, reb, K, n_probe=NCEN).collect()
    }
    exact = _brute(union.collect(), q.collect(), K)
    assert got_inc == exact
    assert got_reb == exact

    # partial probe: appended index == in-memory probe over the union
    # with the SAME (A-trained) centroids — append changes nothing but
    # which table rows live in
    cents_a = load_ivf_centroids(spark, inc)
    got_inc2 = {
        (r["qid"], r["vid"], r["rank"])
        for r in ivf_topk_indexed(q, inc, K, n_probe=3).collect()
    }
    mem2 = {
        (r["qid"], r["vid"], r["rank"])
        for r in ivf_topk(
            q, union, K, corpus_id="vec_id", n_probe=3, centroids=cents_a
        ).collect()
    }
    assert got_inc2 == mem2


def test_probe_scan_is_partition_pruned(spark, tmp_path):
    corpus = _emb(spark, 0, 120)
    root = str(tmp_path / "ivf")
    build_ivf_index(corpus, root, n_centroids=NCEN, n_iter=3)
    # one query, narrow probe -> most posting partitions must be pruned
    q = _queries(corpus).limit(1)
    res = ivf_topk_indexed(q, root, K, n_probe=2)
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "_cid" in plan
    assert res.count() == K


def test_filtered_search_is_exact_over_subset(spark):
    """corpus_filter + full probe == brute top-k over the filtered
    subset; post-filtering the unfiltered k-list is NOT equivalent
    (returns fewer than k for selective predicates)."""
    import numpy as np
    from pyspark.sql import functions as F

    from ssb_sgis_spark.operators.ann import cosine_topk
    from ssb_sgis_spark.operators.ivf import ivf_topk

    rng = np.random.default_rng(5)
    rows = [
        (int(i), rng.standard_normal(8).astype("float32").tolist(), int(i % 5))
        for i in range(200)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    queries = emb.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    got = ivf_topk(
        queries, emb, 5, corpus_id="vec_id", n_centroids=8, n_probe=8,
        corpus_filter=F.col("label") == 2,
    )
    brute = cosine_topk(
        queries, emb.filter(F.col("label") == 2), 5, corpus_id="vec_id"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, brute.collect()))
    # post-filter of the unfiltered top-5: selective label leaves <5 hits
    post = (
        cosine_topk(queries, emb, 5, corpus_id="vec_id")
        .join(emb.select(F.col("vec_id").alias("vid"), "label"), on="vid")
        .filter(F.col("label") == 2)
    )
    per_q = {r.qid: r.n for r in post.groupBy("qid").agg(F.count("*").alias("n")).collect()}
    assert any(n < 5 for n in per_q.values()) or len(per_q) < queries.count()
