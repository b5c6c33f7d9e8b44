"""DSIR importance weights (operators/dsir.py)."""

from pyspark.sql import functions as F

from ssb_sgis_spark.operators.dsir import dsir_weights


def _docs(spark):
    rows = [
        # target slice: characteristic bigram "good clean"
        (1, "good clean text here", "t"),
        (2, "good clean words again", "t"),
        # raw-only docs: characteristic bigram "spam spam"
        (3, "spam spam spam spam", "s"),
        (4, "spam spam junk junk", "s"),
        # single token -> no bigrams -> weight exactly 0
        (5, "lonely", "s"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_orders_target_like_docs_first(spark):
    out = {
        r.doc_id: r.dsir_micro
        for r in dsir_weights(_docs(spark), F.col("lang") == "t").collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}, "exactly one row per document"
    # target docs outrank raw-only docs; the no-bigram doc is exactly 0
    assert min(out[1], out[2]) > max(out[3], out[4])
    assert out[5] == 0
    # grams unseen in the target slice push the weight negative
    assert out[3] < 0 and out[4] < 0


def test_dsir_weight_is_gram_additive(spark):
    """Doubling a document's grams doubles its weight (the score is a
    plain integer sum over gram buckets)."""
    docs = _docs(spark)
    doubled = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 3, F.lit("spam spam spam spam spam spam spam")).otherwise(
            F.col("text")
        ),
    )
    base = {r.doc_id: r.dsir_micro for r in dsir_weights(docs, F.col("lang") == "t").collect()}
    # rebuilding with a longer doc changes the model too, so instead
    # check additivity within ONE fit: doc 3 has 3 identical grams, so
    # its weight must be 3x the per-gram lambda — i.e. divisible by 3
    assert base[3] % 3 == 0
