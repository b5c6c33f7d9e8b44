"""BM25 ranked retrieval: closed-form checks + the integer-exactness
invariants behind the `bm25` oracle query."""

import math

from pyspark.sql import functions as F


def _bm25_ref(corpus: list[str], qterms: list[str], k1=1.2, b=0.75):
    """Float reference BM25 (idf = ln((2N+2)/(2df+1))) for rank-order
    comparison; scores per doc index."""
    toks = [c.split(" ") for c in corpus]
    n = len(corpus)
    s = sum(len(t) for t in toks)
    avgdl = s / n
    df = {}
    for t in toks:
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = []
    for t in toks:
        dl = len(t)
        score = 0.0
        for q in qterms:
            d = df.get(q)
            if not d:
                continue
            tf = t.count(q)
            if not tf:
                continue
            idf = math.log((2 * n + 2) / (2 * d + 1))
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        out.append(score)
    return out


def test_bm25_rank_order_matches_float_reference(spark):
    from ssb_sgis_spark.operators.search import bm25_topk

    corpus = [
        "apple banana cherry date egg",
        "apple apple banana fig",
        "grape melon kiwi lime plum orange pear",
        "apple banana cherry apple banana",
        "date egg fig grape",
    ]
    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(0, "apple banana zzz")], "query_id long, qtext string"
    )
    rows = (
        bm25_topk(docs, queries, k=5, max_query_terms=3)
        .orderBy("rank")
        .collect()
    )
    ref = _bm25_ref(corpus, ["apple", "banana", "zzz"])
    want = sorted(
        [i for i, sc in enumerate(ref) if sc > 0],
        key=lambda i: (-ref[i], i),
    )
    assert [r.doc_id for r in rows] == want
    # micro-nat integer scores track the float reference within the
    # per-term floor loss (<= n_matched_terms micro-nats + fp noise)
    for r in rows:
        assert abs(r.score_micro / 1e6 - ref[r.doc_id]) < 3e-6 + 3e-9 * abs(ref[r.doc_id])


def test_bm25_duplicate_query_term_scores_per_occurrence(spark):
    from ssb_sgis_spark.operators.search import bm25_topk

    docs = spark.createDataFrame(
        [(0, "x y z"), (1, "a b c")], "doc_id long, text string"
    )
    q1 = spark.createDataFrame([(0, "x q q q")], "query_id long, qtext string")
    q2 = spark.createDataFrame([(0, "x x q q")], "query_id long, qtext string")
    s1 = bm25_topk(docs, q1, k=5).collect()[0].score_micro
    s2 = bm25_topk(docs, q2, k=5).collect()[0].score_micro
    assert s2 == 2 * s1


def test_bm25_duckdb_parity_small(spark):
    """Bit-exact Spark ≡ DuckDB on a small random-ish corpus (the same
    compare the driver runs at sf0.01)."""
    import duckdb
    import pandas as pd

    from ssb_sgis_spark.operators.search import bm25_topk, bm25_topk_sql

    corpus = [
        (i, " ".join(f"t{(i * 7 + j * j) % 23}" for j in range(5 + i % 9)))
        for i in range(60)
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    queries = docs.filter("doc_id % 10 = 3").select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("qtext")
    )
    res = (
        bm25_topk(docs, queries, k=7)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in corpus)
        + ") v(doc_id, text)"
    )
    ora = (
        con.execute(
            bm25_topk_sql(
                "documents",
                "(SELECT doc_id AS query_id, text AS qtext FROM documents"
                " WHERE doc_id % 10 = 3)",
                k=7,
            )
        )
        .df()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(res.astype("int64"), ora.astype("int64"))


def test_tfidf_keywords_rare_term_wins(spark):
    from ssb_sgis_spark.operators.search import tfidf_keywords

    rows = [
        (1, "common common common zebra"),
        (2, "common words here too"),
        (3, "common words again common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_keywords(df, j=2).collect()
    top = {r.doc_id: r.term for r in out if r.kw_rank == 1}
    # 'zebra' is unique to doc 1 -> highest idf beats tf=3 of the
    # corpus-universal 'common' (idf exactly ln(4/4)=0)
    assert top[1] == "zebra"
    got1 = {(r.kw_rank, r.term) for r in out if r.doc_id == 1}
    assert (2, "common") in got1
    # exactly j rows per doc (docs have >= j distinct terms)
    from collections import Counter

    assert set(Counter(r.doc_id for r in out).values()) == {2}
