"""Benchmark-contamination flagging (operators/contamination.py)."""

from pyspark.sql import functions as F


def test_flag_contamination_known_overlap(spark):
    from ssb_sgis_spark.operators.contamination import flag_contamination

    bench = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [
            # shares the 8-grams "a..h", "b..i", "c..j" (3 distinct)
            (10, "a b c d e f g h i j"),
            # shares exactly one 8-gram (the first window)
            (11, "a b c d e f g h X Y"),
            # same words, shifted by one -> no verbatim 8-gram
            (12, "z a b c d e f g X"),
            # shorter than n: must produce zero grams, not crash
            (13, "a b c"),
            (14, "completely different words here now ok fine yes sure"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.n_hits for r in flag_contamination(docs, bench).collect()}
    assert out == {10: 3, 11: 1}


def test_word_ngrams_short_text_empty(spark):
    from ssb_sgis_spark.operators.contamination import word_ngrams_col

    df = spark.createDataFrame([("a b c",), ("a b c d e f g h",)], ["text"])
    rows = df.select(F.size(word_ngrams_col(F.col("text"), 8)).alias("n")).collect()
    assert [r.n for r in rows] == [0, 1]


def test_contamination_oracle_parity(spark):
    """Spark result == DuckDB mirror on the sf0.001 corpus."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = {
        (r.doc_id, r.n_hits)
        for r in entry.q_contamination(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = {(int(a), int(b)) for a, b in con.sql(entry._contamination_oracle()).fetchall()}
    assert got == want and len(got) > 0
