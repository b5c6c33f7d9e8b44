"""Sliver elimination — dissolve small polygons into a neighbor.

Reference: ``eliminate_by_largest`` / ``_smallest``
(``sgis/geopandas_tools/polygon_operations.py:290-434``): each geometry
of ``to_eliminate`` merges into the largest (or smallest) intersecting
geometry of ``keep``.  The reference's sort+drop-duplicates idiom
(:401-405) is a ranking window here; the merge itself is the dissolve
kernel keyed by the chosen keeper.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..kernels import wkb
from ..kernels.boolean import parts_intersect, union_all
from .geomtable import with_area
from .overlay import candidate_pairs, _BOUNDS


def _eliminate(keep: DataFrame, to_eliminate: DataFrame, id_col: str, geometry_col: str, largest: bool) -> DataFrame:
    k = with_area(keep.select(id_col, geometry_col), geometry_col, "_karea")
    e = to_eliminate.select(
        F.monotonically_increasing_id().alias("_eid"), F.col(geometry_col)
    ).localCheckpoint(eager=True)

    pairs, _ = candidate_pairs(e, k, geometry_col)
    gl, gr = geometry_col, geometry_col + "__r"

    refine_schema = T.StructType(
        [
            T.StructField("_eid", T.LongType()),
            T.StructField(id_col, keep.schema[id_col].dataType),
            T.StructField("_karea", T.DoubleType()),
            T.StructField("_egeom", T.BinaryType()),
        ]
    )

    def refine(it):
        for pdf in it:
            if not len(pdf):
                continue
            ga = wkb.decode(pdf[gl].tolist())
            gb = wkb.decode(pdf[gr].tolist())
            keep_rows = [
                i
                for i in range(len(pdf))
                if parts_intersect(ga.geom_parts(i), gb.geom_parts(i))
            ]
            o = pdf.iloc[keep_rows][["_eid", id_col + "__r", "_karea__r", gl]].copy()
            o.columns = ["_eid", id_col, "_karea", "_egeom"]
            yield o

    cand = pairs.mapInPandas(refine, schema=refine_schema)
    order = F.desc("_karea") if largest else F.asc("_karea")
    w = Window.partitionBy("_eid").orderBy(order, F.asc(id_col))
    chosen = (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("_eid", id_col, "_egeom")
    )

    # merge: keeper geometry + its slivers -> one union per keeper
    merged_in = keep.select(id_col, F.col(geometry_col).alias("_g")).unionByName(
        chosen.select(id_col, F.col("_egeom").alias("_g"))
    )
    schema = T.StructType(
        [keep.schema[id_col], T.StructField("geometry", T.BinaryType())]
    )

    def union_kernel(key, pdf):
        ga = wkb.decode(pdf["_g"].tolist())
        out = union_all([ga.geom_parts(g) for g in range(len(ga))])
        row = pdf.iloc[:1][[id_col]].copy()
        row["geometry"] = [wkb.encode_geom(out, wkb.T_POLYGON)] if out else [None]
        return row

    return merged_in.groupBy(id_col).applyInPandas(union_kernel, schema=schema)


def eliminate_by_largest(keep: DataFrame, to_eliminate: DataFrame, id_col: str = "pid", geometry_col: str = "geometry") -> DataFrame:
    """Merge each sliver into its largest intersecting keeper."""
    return _eliminate(keep, to_eliminate, id_col, geometry_col, largest=True)


def eliminate_by_smallest(keep: DataFrame, to_eliminate: DataFrame, id_col: str = "pid", geometry_col: str = "geometry") -> DataFrame:
    """Merge each sliver into its smallest intersecting keeper."""
    return _eliminate(keep, to_eliminate, id_col, geometry_col, largest=False)
