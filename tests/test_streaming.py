"""Streaming ingestion: stream rollup equals the batch rollup on the
same files (batch/stream expression parity)."""

import pytest
from pyspark.sql import functions as F

from ssb_sgis_spark.sources.pages import pages_df, with_page_payload
from ssb_sgis_spark.streaming.ingest import (
    cell_counts_windowed,
    read_pages_stream,
    run_to_sink,
    with_cell_index,
)

SF = "/root/testdata/sf0.001"


def test_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "pages_in")
    ckpt = str(tmp_path / "ckpt")
    batch = pages_df(spark, SF, with_payload=True).limit(2000)
    batch.write.parquet(src)

    stream = read_pages_stream(spark, src, batch.schema)
    agg = cell_counts_windowed(with_cell_index(stream, res=10))
    q = run_to_sink(agg, ckpt, "cells_test")
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["cell"]): r["n_pages"]
        for r in spark.sql("SELECT * FROM cells_test").collect()
    }
    exp_df = (
        with_cell_index(spark.read.parquet(src), res=10)
        .groupBy(F.window(F.col("warc_ts"), "10 minutes").alias("w"), "cell")
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "cell", "n_pages")
    )
    exp = {(r["window_start"], r["cell"]): r["n_pages"] for r in exp_df.collect()}
    assert got == exp
    assert sum(got.values()) == 2000


def test_windowed_cms_stream_equals_batch_and_merges(spark, tmp_path):
    """Per-window streaming CMS registers == batch CMS of each window's
    rows (shared expressions), and the sum over windows == the batch
    all-time sketch (CMS merge-by-sum)."""
    from ssb_sgis_spark.operators.sketch import cms_sketch
    from ssb_sgis_spark.streaming.sketch import windowed_cms

    src = str(tmp_path / "pages_cms")
    ckpt = str(tmp_path / "ckpt_cms")
    batch = pages_df(spark, SF, with_payload=True).limit(1500)
    batch = batch.withColumn("dom", F.concat(F.lit("d"), F.pmod("uid", F.lit(13))))
    batch.write.parquet(src)

    stream = read_pages_stream(spark, src, batch.schema)
    agg = windowed_cms(stream, "dom", ts_col="warc_ts", window="10 minutes")
    q = run_to_sink(agg, ckpt, "cms_stream_test")
    q.awaitTermination(120)

    got = {
        (r.window_start, r.seed, r.col): r.cnt
        for r in spark.sql("SELECT * FROM cms_stream_test").collect()
    }
    src_df = spark.read.parquet(src).withColumn(
        "w", F.window(F.col("warc_ts"), "10 minutes")["start"]
    )
    exp = {}
    for w in [r.w for r in src_df.select("w").distinct().collect()]:
        for r in cms_sketch(src_df.filter(F.col("w") == w), "dom").collect():
            exp[(w, r.seed, r.col)] = r.cnt
    assert got == exp
    # merge across windows == all-time batch sketch
    merged = {}
    for (_, s, c), n in got.items():
        merged[(s, c)] = merged.get((s, c), 0) + n
    alltime = {
        (r.seed, r.col): r.cnt
        for r in cms_sketch(spark.read.parquet(src), "dom").collect()
    }
    assert merged == alltime


def test_stream_hex_two_batches_equals_batch(spark, tmp_path):
    """Windowed hex density over a MULTI-TRIGGER stream (2 file batches,
    maxFilesPerTrigger=1) equals the batch rollup — state merges across
    micro-batches and the hex assignment is the same expression in both
    paths."""
    from ssb_sgis_spark.hexcells import hex_bin
    from ssb_sgis_spark.streaming.ingest import hex_counts_windowed

    src = str(tmp_path / "hex_in")
    ckpt = str(tmp_path / "hex_ckpt")
    batch = pages_df(spark, SF, with_payload=True).select(
        "uid", "x", "y", "warc_ts"
    )
    batch.filter(F.col("uid") % 2 == 0).coalesce(1).write.parquet(src)
    batch.filter(F.col("uid") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    stream = read_pages_stream(
        spark, src, batch.schema, max_files_per_trigger=1
    )
    q = run_to_sink(hex_counts_windowed(stream, 4000.0), ckpt, "hex_test")
    q.awaitTermination(120)
    assert q.lastProgress is not None

    got = {
        (r["win_start_s"], r["hex_q"], r["hex_r"]): r["n_pages"]
        for r in spark.sql("SELECT * FROM hex_test").collect()
    }
    exp_df = (
        hex_bin(spark.read.parquet(src), 4000.0)
        .groupBy(
            F.window(F.col("warc_ts"), "1 hour").alias("w"), "hex_q", "hex_r"
        )
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("s"),
            "hex_q",
            "hex_r",
            "n_pages",
        )
    )
    exp = {(r["s"], r["hex_q"], r["hex_r"]): r["n_pages"] for r in exp_df.collect()}
    assert got == exp and sum(got.values()) == batch.count()
