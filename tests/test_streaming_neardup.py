"""Streaming near-dup band registry (streaming/neardup.py): stream's
per-doc verdict across two checkpointed micro-batches must equal a
python replay of the SAME band keys through a fresh registry."""

from pyspark.sql import functions as F

from ssb_sgis_spark.streaming.neardup import band_keys_array_col, near_dup_stream
from tests.conftest import spark  # noqa: F401

SCHEMA = "doc_id long, text string"

B1 = [
    (1, "the quick brown fox jumps over the lazy dog tonight again"),
    (2, "an entirely different document about glacier meltwater chemistry"),
    # in-batch near-dup of 1 (one word changed)
    (3, "the quick brown fox jumps over the lazy cat tonight again"),
]
B2 = [
    # cross-batch near-dup of 1
    (4, "the quick brown fox jumps over the lazy dog tonight again"),
    (5, "a third topic discussing harbor logistics and container cranes"),
    # cross-batch near-dup of 2
    (6, "an entirely different document about glacier meltwater chemistry"),
]


def _batch_keys(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = df.select(
        "doc_id", F.explode(band_keys_array_col(F.col("text"))).alias("bk")
    ).collect()
    keys = {}
    for r in out:
        keys.setdefault(r.doc_id, []).append(r.bk)
    return keys


def _replay(all_keys, order):
    registry, verdict = set(), {}
    for doc in order:
        hit = False
        for bk in all_keys[doc]:
            if bk in registry:
                hit = True
            registry.add(bk)
        verdict[doc] = hit
    return verdict


def test_near_dup_stream_matches_replay(spark, tmp_path):
    src, ckpt, sink = (str(tmp_path / p) for p in ("in", "ckpt", "out"))

    def run(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            near_dup_stream(stream, n_shards=4)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(sink)

    run(B1)
    out = run(B2)
    got = {
        r.doc_id: r.dup
        for r in out.groupBy("doc_id").agg(F.max("seen").alias("dup")).collect()
    }
    keys = _batch_keys(spark, B1 + B2)
    want = _replay(keys, order=[1, 2, 3, 4, 5, 6])
    assert got == want
    # the scenario actually exercises both verdicts
    assert want[3] and want[4] and want[6]
    assert not want[1] and not want[2] and not want[5]
