"""Structured Streaming ingestion: pages stream → cell-indexed rollups.

The reference is batch-only; streaming obligations come from the north
rule (checkpoint-resume, lineage).  The natural streaming shape for the
10^12-page lake is *append-only micro-batch ingestion*: new WARC drops
land as files, the stream assigns each page its quadtree cell / SSB grid
id (pure column arithmetic — the same expressions as the batch engine,
so batch and stream agree bit-for-bit), and windowed per-cell counts
feed the tile manifest / skew histograms.

Checkpointing is Spark's own (``checkpointLocation``), which makes the
ingestion resumable exactly like the batch tile manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cells import cell_of_xy_col, ssb_grid_id_col


def read_pages_stream(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    r = spark.readStream.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def with_cell_index(
    stream: DataFrame, res: int = 13, gridsize: int = 1000
) -> DataFrame:
    """Attach the engine's partition keys to a page stream — identical
    expressions to the batch path (cells.py), so a row gets the same cell
    whether it arrives in batch or stream."""
    return stream.withColumn(
        "cell", cell_of_xy_col(F.col("x"), F.col("y"), res)
    ).withColumn("SSBID", ssb_grid_id_col(F.col("x"), F.col("y"), gridsize))


def cell_counts_windowed(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked windowed per-cell page counts — the streaming skew
    histogram that feeds the salt-count policy for hot cells."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("cell"))
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "cell", "n_pages")
    )


def hex_counts_windowed(
    stream: DataFrame,
    size: float,
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed per-HEX page counts — the H3-style streaming
    density rollup (hexcells.py): the hex assignment is the same
    whole-stage-codegen expression as the batch path, so a page lands in
    the same hex whether it arrives in batch or stream, and the windowed
    counts are the live version of :func:`~..hexcells.hex_density`.

    Emitted ``win_start_s`` is the window start in epoch SECONDS (BIGINT)
    — timezone-neutral for cross-engine compares."""
    from ..hexcells import hex_bin

    return (
        hex_bin(stream.withWatermark(ts_col, watermark), size)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col("hex_q"),
            F.col("hex_r"),
        )
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("win_start_s"),
            "hex_q",
            "hex_r",
            "n_pages",
        )
    )


def run_to_sink(
    agg: DataFrame,
    checkpoint_dir: str,
    query_name: str = "cell_counts",
):
    """Start the rollup with availableNow semantics (drain what's there,
    then stop) — resumable from ``checkpoint_dir``."""
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def domain_counts_windowed(
    stream: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed per-DOMAIN page counts — the heavy-hitter
    state behind streaming top-k (who is flooding the crawl this hour):
    the domain extraction is the same codegen expression as the batch
    path (`functions/url.domain_col`), the count state is native
    watermark-evicted streaming aggregation (memory follows active
    windows × domains, and registered domains are a bounded set by
    construction of the crawl frontier — for an adversarial unbounded
    key space, cap with the CMS sketch first, `streaming/sketch.py`).

    The top-k PROJECTION over these counts is applied on the drained
    sink (a rank window is not a streaming-supported operator; the
    standard pattern is stateful counts in-stream + rank-at-read)."""
    from ..functions.url import domain_col

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            domain_col(F.col(url_col)).alias("domain"),
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").cast("long").alias("win_start_s"),
            "domain",
            "n",
        )
    )
