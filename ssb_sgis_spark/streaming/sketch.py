"""Streaming sketches: watermarked windowed count-min over a stream.

The streaming face of ``operators/sketch.py``: per-event-time-window CMS
registers of a key stream (e.g. bytes per domain per 10 minutes).  The
register expressions are the SAME shared SQL as the batch operator, so a
window's sketch is bit-identical to the batch sketch of that window's
rows — and because CMS merges by sum, summing the per-window registers
reproduces the all-time batch sketch exactly (both properties tested).

State is the windowed aggregation's own store: watermark-evicted, so
memory follows ACTIVE windows x (depth x width) registers, not the key
cardinality — the whole point of sketching a 10^12-row stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketch import CMS_DEPTH, CMS_WIDTH_HEX, cms_register_exprs


def windowed_cms(
    stream: DataFrame,
    value_col: str,
    ts_col: str = "warc_ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    weight_col: str | None = None,
    depth: int = CMS_DEPTH,
    width_hex: int = CMS_WIDTH_HEX,
) -> DataFrame:
    """(window_start, seed, col, cnt) streaming register rows."""
    cols = cms_register_exprs(value_col, depth, width_hex)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    long_rows = stream.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("seed"),
                        F.expr(c).alias("col"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("_s"),
        w.alias("_w"),
    )
    return (
        long_rows.groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col("_s.seed").alias("seed"),
            F.col("_s.col").alias("col"),
        )
        .agg(F.sum("_w").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "seed", "col", "cnt")
    )
