"""Webtext pipeline operators: LSH-ANN recall, near-dup behaviour,
extraction parity (pandas oracle)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ssb_sgis_spark.operators.ann import ann_lsh_topk, cosine_topk
from ssb_sgis_spark.operators.dedup import near_dup_pairs
from ssb_sgis_spark.operators.textops import extract_text
from ssb_sgis_spark.sources.documents import (
    EXACT_OFFSET,
    NEAR_OFFSET,
    docs_with_dups_df,
)
from ssb_sgis_spark.sources.pages import extract_text_from_html, pages_df

SF = "/root/testdata/sf0.001"


def test_ann_lsh_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    exact = cosine_topk(queries, emb, 5, corpus_id="vec_id").collect()
    approx = ann_lsh_topk(queries, emb, 5, corpus_id="vec_id", n_planes=4).collect()
    exact_set = {(r["qid"], r["vid"]) for r in exact}
    approx_set = {(r["qid"], r["vid"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 4 planes, clustered embeddings (labels) -> decent recall; exactness is
    # not expected, usefulness is
    assert recall > 0.3
    # rank-1 self-hit always survives (query is its own bucket neighbor)
    self_hits = {r["qid"] for r in approx if r["vid"] == r["qid"]}
    assert self_hits == {r["qid"] for r in exact if r["vid"] == r["qid"]}


def test_near_dup_finds_injected_copies(spark):
    pairs = near_dup_pairs(docs_with_dups_df(spark, SF)).collect()
    byset = {(r["a"], r["b"]): (r["inter_n"], r["union_n"]) for r in pairs}
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()
    ids = [r["doc_id"] for r in docs]
    # every exact copy pair is found with jaccard 1
    for d in ids:
        assert (d, d + EXACT_OFFSET) in byset
        i, u = byset[(d, d + EXACT_OFFSET)]
        assert i == u
    # most near copies are found (LSH probability < 1 by design), and when
    # found their jaccard is high but < 1
    found = [d for d in ids if (d, d + NEAR_OFFSET) in byset]
    assert len(found) > 0.5 * len(ids)
    for d in found[:20]:
        i, u = byset[(d, d + NEAR_OFFSET)]
        assert 0.5 < i / u < 1.0


def test_extract_text_byte_identical(spark):
    pages = pages_df(spark, SF, with_payload=True).limit(200)
    rows = extract_text(pages).select("uid", "html", "text", "extracted_text").collect()
    assert len(rows) == 200
    for r in rows:
        assert r["extracted_text"] == r["text"]
        assert extract_text_from_html(r["html"]) == r["text"]


def test_cosine_pairs_exact_blocked_vs_brute(spark):
    """cosine_pairs (blocked all-pairs matmul) == brute-force numpy pairs,
    including across-block and diagonal-block pairs."""
    import numpy as np

    from ssb_sgis_spark.operators.ann import cosine_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.collect()
    m = np.vstack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = mn @ mn.T
    tau = 0.3
    ia, ib = np.nonzero(np.triu(cos >= tau, k=1))
    expect = {
        (min(ids[i], ids[j]), max(ids[i], ids[j])) for i, j in zip(ia, ib)
    }
    got_rows = cosine_pairs(emb, tau, n_blocks=3).collect()
    got = {(r["a_id"], r["b_id"]) for r in got_rows}
    assert len(got_rows) == len(got)  # no duplicate pairs
    assert got == expect and len(expect) > 0
    # cosine values match the brute computation
    lookup = {(ids[i], ids[j]): cos[i, j] for i, j in zip(ia, ib)}
    lookup.update({(ids[j], ids[i]): cos[i, j] for i, j in zip(ia, ib)})
    for r in got_rows:
        assert abs(r["cos"] - lookup[(r["a_id"], r["b_id"])]) < 1e-9


def test_cosine_pairs_lsh_recall(spark):
    from ssb_sgis_spark.operators.ann import cosine_pairs, cosine_pairs_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r["a_id"], r["b_id"]) for r in cosine_pairs(emb, 0.3).collect()}
    approx_rows = cosine_pairs_lsh(emb, 0.3, n_planes=4).collect()
    approx = {(r["a_id"], r["b_id"]) for r in approx_rows}
    assert len(approx_rows) == len(approx)  # multiprobe must not duplicate
    assert approx <= exact  # rescoring is exact -> no false positives
    assert len(approx & exact) / len(exact) > 0.3


def test_ivf_full_probe_equals_brute(spark):
    """Probing every posting list must reproduce brute-force top-k
    exactly (IVF partitions the corpus; rescoring is exact)."""
    from ssb_sgis_spark.operators.ivf import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    exact = {
        (r["qid"], r["vid"], r["rank"])
        for r in cosine_topk(queries, emb, 5, corpus_id="vec_id").collect()
    }
    full = {
        (r["qid"], r["vid"], r["rank"])
        for r in ivf_topk(
            queries, emb, 5, corpus_id="vec_id", n_centroids=16, n_probe=16,
            n_iter=3,
        ).collect()
    }
    assert full == exact


def test_ivf_partial_probe_recall_and_determinism(spark):
    from ssb_sgis_spark.operators.ivf import ivf_topk, train_ivf_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    exact = {
        (r["qid"], r["vid"])
        for r in cosine_topk(queries, emb, 5, corpus_id="vec_id").collect()
    }
    cents = train_ivf_centroids(emb, n_centroids=16, n_iter=3)
    got1 = ivf_topk(queries, emb, 5, corpus_id="vec_id", n_probe=4,
                    centroids=cents).collect()
    got2 = ivf_topk(queries, emb, 5, corpus_id="vec_id", n_probe=4,
                    centroids=cents).collect()
    s1 = {(r["qid"], r["vid"], r["rank"]) for r in got1}
    s2 = {(r["qid"], r["vid"], r["rank"]) for r in got2}
    assert s1 == s2  # deterministic index + probe
    pairs = {(r["qid"], r["vid"]) for r in got1}
    recall = len(pairs & exact) / len(exact)
    assert recall > 0.5  # label-clustered embeddings, 4/16 lists probed


def test_geocode_html_recovers_formatted_coords(spark):
    """geocode_html must recover exactly the %.3f-rounded coordinate the
    page template embedded — the Arrow parse is byte/bit-stable, and a
    null-coordinate page yields NULL x/y instead of an error."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ssb_sgis_spark.operators.textops import geocode_html
    from ssb_sgis_spark.sources.pages import pages_df

    pages = pages_df(spark, SF, with_payload=True).limit(500)
    expected = (
        pages.select(
            "uid",
            F.format_string("%.3f", "x").cast("double").alias("ex"),
            F.format_string("%.3f", "y").cast("double").alias("ey"),
        )
    )
    got = geocode_html(pages.select("uid", "html"))
    joined = got.join(expected, "uid").select("uid", "x", "y", "ex", "ey").toPandas()
    assert len(joined) == 500
    assert (joined["x"] == joined["ex"]).all()
    assert (joined["y"] == joined["ey"]).all()

    # a page with no geo attribute -> NULL coords, not a crash
    blank = spark.createDataFrame(
        [(1, bytearray(b"<html><body>no geo here</body></html>"))], "uid long, html binary"
    )
    row = geocode_html(blank).collect()[0]
    assert row.x is None and row.y is None


def test_quantize_int8_bounds_and_zero_vector(spark):
    from ssb_sgis_spark.operators.ann import quantize_int8

    df = spark.createDataFrame(
        [(0, [0.5, -1.0, 0.25]), (1, [0.0, 0.0, 0.0]), (2, [3.0])],
        "vid long, embedding array<float>",
    )
    rows = {r.vid: r.q for r in df.select("vid", quantize_int8(F.col("embedding")).alias("q")).collect()}
    n0 = (0.5**2 + 1.0 + 0.25**2) ** 0.5
    assert rows[0] == [
        round(127 * 0.5 / n0),
        round(127 * -1.0 / n0),
        round(127 * 0.25 / n0),
    ]  # round(127*x/||x||)
    assert rows[1] == [0, 0, 0]               # zero vector -> zeros
    assert rows[2] == [127]
    assert all(abs(v) <= 127 for q in rows.values() for v in q)


def test_quantized_topk_recall_vs_exact_cosine(spark):
    """int8 quantization is lossy but must keep high top-k agreement
    with the exact float cosine ranking on the real embedding table."""
    from ssb_sgis_spark.operators.ann import cosine_topk, quantized_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    exact = {
        (r.qid, r.vid)
        for r in cosine_topk(queries, emb, 5, corpus_id="vec_id").collect()
    }
    quant = {
        (r.qid, r.vid)
        for r in quantized_topk(queries, emb, 5, corpus_id="vec_id").collect()
    }
    nq = queries.count()
    assert len(quant) == 5 * nq
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.85, recall
    # self-match survives quantization: every query's own vector at rank 1
    top1 = {
        r.qid: r.vid
        for r in quantized_topk(queries, emb, 1, corpus_id="vec_id").collect()
    }
    assert all(q == v for q, v in top1.items())


def test_lsh_quantized_topk_recall_and_exactness_properties(spark):
    """The integer-exact LSH variant: buckets are integer sign bits of
    quantized codes (no ulp dependence), multiprobe widens recall, and
    the self-match always survives (a query collides with itself in its
    own bucket and the integer self-dot is maximal)."""
    from ssb_sgis_spark.operators.ann import lsh_quantized_topk, quantized_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    full = {
        (r.qid, r.vid)
        for r in quantized_topk(queries, emb, 5, corpus_id="vec_id").collect()
    }
    lsh = lsh_quantized_topk(queries, emb, 5, corpus_id="vec_id", n_planes=4).collect()
    lsh_set = {(r.qid, r.vid) for r in lsh}
    recall = len(full & lsh_set) / len(full)
    assert recall >= 0.5, recall  # 6-bit buckets + 1-bit multiprobe
    # rank-1 is always the query itself (self-bucket collision + max dot)
    top1 = {r.qid: r.vid for r in lsh if r.rank == 1}
    assert all(q == v for q, v in top1.items())
    # multiprobe strictly widens (or equals) the zero-probe candidate set
    narrow = {
        (r.qid, r.vid)
        for r in lsh_quantized_topk(
            queries, emb, 5, corpus_id="vec_id", n_planes=4, multiprobe=0
        ).collect()
    }
    assert len(lsh_set) >= len(narrow)
