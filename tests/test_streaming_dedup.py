"""Streaming stateful dedup (streaming/dedup.py): first-seen admission
across micro-batches, state surviving a checkpointed restart, and the
bounded-memory Bloom mode."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ssb_sgis_spark.streaming.dedup import dedup_stream
from tests.conftest import spark  # noqa: F401

SCHEMA = "doc_id long, text string"


def _write_batch(spark, src, rows, part):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _run_once(spark, src, ckpt, sink, bloom_bits=0):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = dedup_stream(stream, "text", n_shards=4, bloom_bits=bloom_bits)
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    try:
        return spark.read.parquet(sink).collect()
    except Exception:
        return []


def test_dedup_stream_across_restarts(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")

    # batch 1: 3 distinct texts, one in-batch duplicate
    _write_batch(
        spark, src,
        [(1, "alpha"), (2, "beta"), (3, "alpha"), (4, "gamma")], 1,
    )
    rows1 = _run_once(spark, src, ckpt, sink)
    assert sorted({r["text"] for r in rows1}) == ["alpha", "beta", "gamma"]
    assert len(rows1) == 3  # in-batch dup dropped

    # batch 2 (same checkpoint -> state resumes): dups of batch 1 + new
    _write_batch(
        spark, src,
        [(5, "alpha"), (6, "delta"), (7, "beta"), (8, "delta"), (9, "epsilon")], 2,
    )
    rows2 = _run_once(spark, src, ckpt, sink)
    new = [r for r in rows2 if r["doc_id"] >= 5]
    assert sorted(r["text"] for r in new) == ["delta", "epsilon"]
    assert len(rows2) == 5  # 3 + 2 admitted total
    # every admitted text exactly once overall
    texts = [r["text"] for r in rows2]
    assert len(texts) == len(set(texts))


def test_dedup_stream_bloom_mode(spark, tmp_path):
    """Bloom state: no duplicate ever admitted; with a roomy bitmap all
    distinct docs pass (FP ~ (kn/m)^k is negligible at 20 docs / 2^16 bits)."""
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    rows = [(i, f"doc-{i % 12}") for i in range(24)]  # 12 distinct, each twice
    _write_batch(spark, src, rows, 1)
    got = _run_once(spark, src, ckpt, sink, bloom_bits=1 << 16)
    texts = [r["text"] for r in got]
    assert len(texts) == len(set(texts))  # no dup admitted
    assert len(texts) == 12  # all distinct admitted (no FP at this load)
    # restart with new files: old texts blocked by the restored bitmap
    _write_batch(spark, src, [(100, "doc-3"), (101, "doc-new")], 2)
    got2 = _run_once(spark, src, ckpt, sink, bloom_bits=1 << 16)
    new = [r for r in got2 if r["doc_id"] >= 100]
    assert [r["text"] for r in new] == ["doc-new"]
