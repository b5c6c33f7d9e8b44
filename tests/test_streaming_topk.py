"""Streaming windowed heavy hitters (streaming/ingest.domain_counts_windowed)."""

import tempfile
import uuid

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ssb_sgis_spark.streaming.ingest import (
    domain_counts_windowed,
    read_pages_stream,
    run_to_sink,
)


def _mk_pages(spark, n=600, n_domains=7):
    return spark.range(n).select(
        F.col("id").alias("uid"),
        F.concat(
            F.lit("https://site"),
            (F.col("id") % n_domains).cast("string"),
            F.lit(".no/p/"),
            F.col("id").cast("string"),
        ).alias("url"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("id") * 37)
        ).alias("warc_ts"),
    )


def _topk(counts, k):
    w = Window.partitionBy("win_start_s").orderBy(
        F.col("n").desc(), F.col("domain").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .collect()
    )


def test_stream_equals_batch(spark):
    pages = _mk_pages(spark)
    work = tempfile.mkdtemp(prefix="t_stream_topk_")
    pages.coalesce(2).write.mode("overwrite").parquet(f"{work}/in")
    stream = read_pages_stream(spark, f"{work}/in", pages.schema)
    name = f"t_topk_{uuid.uuid4().hex[:8]}"
    q = run_to_sink(domain_counts_windowed(stream), f"{work}/ckpt", query_name=name)
    q.awaitTermination(120)

    from ssb_sgis_spark.functions.url import domain_col

    batch = (
        pages.groupBy(
            (
                (F.unix_timestamp("warc_ts") / 3600).cast("long") * 3600
            ).alias("win_start_s"),
            domain_col(F.col("url")).alias("domain"),
        )
        .agg(F.count("*").alias("n"))
    )
    got = {
        (r.win_start_s, r.rank): (r.domain, r.n)
        for r in _topk(spark.table(name), 3)
    }
    want = {
        (r.win_start_s, r.rank): (r.domain, r.n) for r in _topk(batch, 3)
    }
    assert got == want and len(got) > 0
