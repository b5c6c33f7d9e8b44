"""Sequence packing / distributed prefix sum (operators/packing.py)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from ssb_sgis_spark.operators.packing import (
    exclusive_prefix_sum,
    pack_sequences,
    token_budget_head,
)


def _docs(spark, n=5000):
    # uneven token counts incl. multi-context docs; ids deliberately
    # NON-contiguous (gaps stress the range bucketing)
    return spark.range(0, n).select(
        (F.col("id") * 7 + (F.col("id") % 3)).alias("doc_id"),
        ((F.xxhash64(F.col("id")) % 400 + 400) % 400 + 1).alias("n_toks"),
    )


def test_bucketed_prefix_sum_equals_global_window(spark):
    df = _docs(spark)
    got = exclusive_prefix_sum(df, "doc_id", "n_toks", small_input=0)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn(
        "cum_before", F.coalesce(F.sum("n_toks").over(w), F.lit(0)).cast("long")
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_pack_invariants(spark):
    ctx = 256
    packed = pack_sequences(
        _docs(spark, 2000), ctx, tokens_col="n_toks", small_input=0
    ).orderBy("doc_id")
    rows = packed.collect()
    # stream contiguity: each doc starts where the previous one ended
    acc = 0
    for r in rows:
        assert r.cum_before == acc
        acc += r.n_tokens
    for r in rows:
        assert 0 <= r.seq_offset < ctx
        assert r.seq_first * ctx + r.seq_offset == r.cum_before
        assert r.n_seqs == r.seq_last - r.seq_first + 1
        # a doc fits in one sequence iff it doesn't cross a boundary
        assert (r.n_seqs == 1) == (r.seq_offset + r.n_tokens <= ctx)


def test_token_budget_head_boundary(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 5), (4, 1)], "doc_id long, n_toks long"
    )
    # budget 35: docs 1,2 fit (30), doc 3 ends exactly at 35 -> kept,
    # doc 4 starts at 35 -> dropped
    got = sorted(
        r.doc_id
        for r in token_budget_head(df, 35, tokens_col="n_toks").collect()
    )
    assert got == [1, 2, 3]


def test_seq_pack_oracle_parity(spark):
    """Distributed path == DuckDB global window on the real corpus."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(map(tuple, entry.q_seq_pack(spark, sf).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = sorted(map(tuple, con.sql(entry.oracle_sql()["seq_pack"]).fetchall()))
    assert got == want and len(got) == 500
