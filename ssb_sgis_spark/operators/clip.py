"""Clip / self-intersections / paint-on-top — overlay-derived operators.

Reference (SURVEY §2.5): ``clean_clip`` (``general.py:513-561``),
``get_intersections`` (``duplicates.py:130-248``), ``update_geometries``
(``duplicates.py:15-127``), ``get_gaps`` (``polygon_operations.py:797-825``).
All reuse the overlay machinery: candidate pairs + the arrangement kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import wkb
from ..kernels.boolean import difference, intersection, overlay_parts
from .overlay import candidate_pairs, clean_overlay, _BOUNDS


def clean_clip(df: DataFrame, mask: DataFrame, geometry_col: str = "geometry") -> DataFrame:
    """Clip df to the union of mask polygons (reference ``general.py:
    513-561``) — an intersection overlay that keeps only left columns and
    merges per left row (mask ids don't multiply rows)."""
    d1 = df.withColumn("_cid", F.monotonically_increasing_id())
    pairs, _ = candidate_pairs(d1, mask.select(geometry_col), geometry_col)
    lcols = [c for c in df.columns if c != geometry_col and c not in _BOUNDS]
    schema = T.StructType(
        [T.StructField("_cid", T.LongType())]
        + [d1.schema[c] for c in lcols]
        + [T.StructField("geometry", T.BinaryType())]
    )
    gl, gr = geometry_col, geometry_col + "__r"

    def kernel(key, pdf):
        ga = wkb.decode(pdf[gl].tolist())
        gb = wkb.decode(pdf[gr].tolist())
        masks = [gb.geom_parts(i) for i in range(len(pdf))]
        # group coverage = "inside ANY mask", so one kernel call intersects
        # A with the UNION of its overlapping masks
        out = overlay_parts([ga.geom_parts(0)], masks, "intersection")
        row = pdf.iloc[: 1 if out else 0][["_cid"] + lcols].copy()
        row["geometry"] = (
            [wkb.encode_geom(out, wkb.T_POLYGON)] if out else pd.Series(dtype=object)
        )
        return row

    return (
        pairs.select("_cid", *lcols, gl, gr)
        .groupBy("_cid")
        .applyInPandas(kernel, schema=schema)
        .drop("_cid")
    )


def get_intersections(
    df: DataFrame, id_col: str, geometry_col: str = "geometry"
) -> DataFrame:
    """Pairwise overlapping areas within ONE table (reference
    ``duplicates.py:130-248``): self cell-join, drop identity pairs,
    2 rows per overlapping pair (like the reference's duplicated output).
    Output: (id, id_other, geometry of the overlap)."""
    right = df.select(F.col(id_col), F.col(geometry_col))
    inter = clean_overlay(
        df.select(id_col, geometry_col),
        right,
        "intersection",
        lsuffix="",
        rsuffix="_other",
    )
    idl, idr = id_col, id_col + "_other"
    return inter.filter(F.col(idl) != F.col(idr))


def update_geometries(
    df: DataFrame,
    order_col: str,
    id_col: str,
    geometry_col: str = "geometry",
) -> DataFrame:
    """Sequential paint-on-top (reference ``duplicates.py:15-127``): rows
    sorted by ``order_col``; each geometry loses the union of all EARLIER
    geometries it overlaps.  Order-sensitive by definition — parallel by
    candidate-group: each row only needs the earlier rows it actually
    overlaps (candidate pairs), so the sequential scan happens per
    overlap-group inside applyInPandas, not globally."""
    d = df.select(order_col, id_col, geometry_col)
    pairs, _ = candidate_pairs(d, d.select(
        F.col(order_col).alias("_o2"), F.col(id_col).alias("_i2"), F.col(geometry_col)
    ), geometry_col)
    # keep only (later, earlier) candidate pairs
    pairs = pairs.filter(F.col("_o2__r") < F.col(order_col))
    lcols = [order_col, id_col]
    schema = T.StructType(
        [d.schema[order_col], d.schema[id_col], T.StructField("geometry", T.BinaryType())]
    )
    gl, gr = geometry_col, geometry_col + "__r"

    def kernel(key, pdf):
        pdf = pdf.sort_values("_o2__r")
        ga = wkb.decode(pdf[gl].tolist())
        gb = wkb.decode(pdf[gr].tolist())
        left = ga.geom_parts(0)
        earlier = [gb.geom_parts(i) for i in range(len(pdf))]
        out = overlay_parts([left], earlier, "difference")
        row = pdf.iloc[: 1 if out else 0][lcols].copy()
        row["geometry"] = (
            [wkb.encode_geom(out, wkb.T_POLYGON)] if out else pd.Series(dtype=object)
        )
        return row

    painted = (
        pairs.select(id_col, order_col, gl, gr, "_o2__r")
        .groupBy(id_col)
        .applyInPandas(kernel, schema=schema)
    )
    untouched = d.join(
        pairs.select(id_col).distinct(), id_col, "left_anti"
    ).select(order_col, id_col, F.col(geometry_col).alias("geometry"))
    return painted.unionByName(untouched)


def get_gaps(df: DataFrame, geometry_col: str = "geometry") -> DataFrame:
    """Gaps inside a polygon coverage = bbox(+buffer) minus polygons, minus
    the outer frame ring (reference ``polygon_operations.py:797-825``).
    Driver-side bbox (one tiny agg); difference runs distributed via the
    group kernel; the outer sliver is dropped by keeping only parts whose
    bbox does not touch the frame."""
    from .geomtable import with_bounds

    b = with_bounds(df, geometry_col)
    tb = b.agg(
        F.min("minx").alias("x0"), F.min("miny").alias("y0"),
        F.max("maxx").alias("x1"), F.max("maxy").alias("y1"),
    ).collect()[0]
    pad = max(tb["x1"] - tb["x0"], tb["y1"] - tb["y0"]) * 0.001 + 1.0
    frame = np.array(
        [
            (tb["x0"] - pad, tb["y0"] - pad),
            (tb["x1"] + pad, tb["y0"] - pad),
            (tb["x1"] + pad, tb["y1"] + pad),
            (tb["x0"] - pad, tb["y1"] + pad),
            (tb["x0"] - pad, tb["y0"] - pad),
        ]
    )
    spark = df.sparkSession
    frame_df = spark.createDataFrame(
        [(0, bytearray(wkb.encode_polygon([frame])))], "gap_id long, geometry binary"
    )
    diff = clean_overlay(frame_df, df.select(geometry_col), "difference", left_id="gap_id")
    from .geomtable import make_all_singlepart

    parts = make_all_singlepart(diff)
    pb = with_bounds(parts)
    # the outer sliver touches the frame boundary; real gaps don't
    return pb.filter(
        (F.col("minx") > tb["x0"]) & (F.col("maxx") < tb["x1"])
        & (F.col("miny") > tb["y0"]) & (F.col("maxy") < tb["y1"])
    ).select("gap_id", "geometry")
