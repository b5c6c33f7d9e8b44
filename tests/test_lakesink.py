"""Exactly-once streaming sink into snapshot tables (streaming/lakesink)."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssb_sgis_spark.sources.snapshots import (
    read_snapshot_table,
    snapshots,
)
from ssb_sgis_spark.streaming.lakesink import (
    commit_stream_batch,
    committed_batch_ids,
    stream_to_snapshot_table,
)

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
)


def _drop_file(spark, src, lo, hi, name):
    df = spark.range(lo, hi).withColumn("v", F.col("id") * 10)
    df.coalesce(1).write.parquet(os.path.join(src, name))


def _stream(spark, src):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )


def test_each_batch_is_one_snapshot_with_batch_id(spark, tmp_path):
    src, tbl, ckpt = (str(tmp_path / d) for d in ("src", "tbl", "ckpt"))
    os.makedirs(src)
    _drop_file(spark, src, 0, 50, "a")
    _drop_file(spark, src, 50, 80, "b")
    stream_to_snapshot_table(_stream(spark, src), tbl, ckpt)
    snaps = snapshots(tbl)
    assert committed_batch_ids(tbl) == {0, 1}
    assert len(snaps) == 2
    assert read_snapshot_table(spark, tbl).count() == 80


def test_replayed_batch_is_skipped(spark, tmp_path):
    src, tbl, ckpt = (str(tmp_path / d) for d in ("src", "tbl", "ckpt"))
    os.makedirs(src)
    _drop_file(spark, src, 0, 20, "a")
    stream_to_snapshot_table(_stream(spark, src), tbl, ckpt)
    assert len(snapshots(tbl)) == 1
    replay = spark.range(0, 20).withColumn("v", F.col("id") * 10)
    assert commit_stream_batch(spark, tbl, replay, 0) is None  # same batch id
    assert len(snapshots(tbl)) == 1
    assert read_snapshot_table(spark, tbl).count() == 20  # no duplicates


def test_resume_picks_up_only_new_files(spark, tmp_path):
    src, tbl, ckpt = (str(tmp_path / d) for d in ("src", "tbl", "ckpt"))
    os.makedirs(src)
    _drop_file(spark, src, 0, 30, "a")
    stream_to_snapshot_table(_stream(spark, src), tbl, ckpt)
    _drop_file(spark, src, 30, 45, "b")
    stream_to_snapshot_table(_stream(spark, src), tbl, ckpt)  # resumes
    assert len(snapshots(tbl)) == 2
    assert committed_batch_ids(tbl) == {0, 1}
    assert read_snapshot_table(spark, tbl).count() == 45


def test_merge_mode_streams_upserts(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    b0 = spark.range(0, 100).withColumn("v", F.col("id") * 10)
    b1 = spark.range(90, 110).withColumn("v", F.col("id") * 1000)
    assert commit_stream_batch(spark, tbl, b0, 0, mode="merge", key_col="id") == 1
    assert commit_stream_batch(spark, tbl, b1, 1, mode="merge", key_col="id") == 2
    got = {r.id: r.v for r in read_snapshot_table(spark, tbl).collect()}
    assert len(got) == 110 and got[95] == 95_000 and got[5] == 50
    # replay of the merge batch is a no-op
    assert commit_stream_batch(spark, tbl, b1, 1, mode="merge", key_col="id") is None
    assert read_snapshot_table(spark, tbl).count() == 110
