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
