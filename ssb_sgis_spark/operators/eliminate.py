"""Sliver elimination — dissolve small polygons into a neighbor.

Reference: ``eliminate_by_longest`` / ``_largest`` / ``_smallest``
(``sgis/geopandas_tools/polygon_operations.py:191-434``): each geometry
of ``to_eliminate`` merges into the neighbor with the longest shared
border (or the largest/smallest intersecting neighbor).  The reference's
sort+drop-duplicates idiom (:401-405) is a ranking window here; the
merge itself is the dissolve kernel keyed by the chosen keeper.

Shared-border length uses the closed-form identity
``(perim(A) + perim(B) - perim(A ∪ B)) / 2`` over the engine's own
union kernel — exact for polygons meeting along their boundaries (the
sliver-elimination case; the reference computes the same quantity via a
line×line overlay, ``polygon_operations.py:242-256``).

``remove_isolated=False`` (the reference default) keeps ``to_eliminate``
rows that touch no keeper: they are appended unchanged with a null id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..kernels import wkb
from ..kernels.boolean import parts_intersect, union_all
from .geomtable import with_area
from .overlay import candidate_pairs, _BOUNDS


def _perimeter(parts) -> float:
    tot = 0.0
    for rings in parts:
        for r in rings:
            rr = np.asarray(r, dtype=np.float64)
            d = np.diff(rr, axis=0)
            tot += float(np.hypot(d[:, 0], d[:, 1]).sum())
    return tot


def _checkpointed_slivers(to_eliminate: DataFrame, geometry_col: str) -> DataFrame:
    """Stamp a stable sliver id; checkpoint pins monotonically_increasing_id
    so the chosen/isolated branches see identical ids."""
    return to_eliminate.select(
        F.monotonically_increasing_id().alias("_eid"), F.col(geometry_col)
    ).localCheckpoint(eager=True)


def _merge_into_keepers(
    keep: DataFrame,
    e: DataFrame,
    chosen: DataFrame,
    id_col: str,
    geometry_col: str,
    remove_isolated: bool,
) -> DataFrame:
    """Dissolve chosen slivers into their keeper; append isolated slivers
    (null id) unless remove_isolated."""
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

    out = merged_in.groupBy(id_col).applyInPandas(union_kernel, schema=schema)
    if remove_isolated:
        return out
    isolated = (
        e.join(chosen.select("_eid"), on="_eid", how="left_anti")
        .select(
            F.lit(None).cast(keep.schema[id_col].dataType).alias(id_col),
            F.col(geometry_col).alias("geometry"),
        )
    )
    return out.unionByName(isolated)


def _eliminate(
    keep: DataFrame,
    to_eliminate: DataFrame,
    id_col: str,
    geometry_col: str,
    largest: bool,
    remove_isolated: bool = False,
) -> DataFrame:
    k = with_area(keep.select(id_col, geometry_col), geometry_col, "_karea")
    e = _checkpointed_slivers(to_eliminate, geometry_col)

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
    return _merge_into_keepers(keep, e, chosen, id_col, geometry_col, remove_isolated)


def eliminate_by_longest(
    keep: DataFrame,
    to_eliminate: DataFrame,
    id_col: str = "pid",
    geometry_col: str = "geometry",
    remove_isolated: bool = False,
) -> DataFrame:
    """Merge each sliver into the neighbor with the longest shared border
    (reference ``polygon_operations.py:191-287``, the default sliver-
    elimination mode).  Border length per candidate pair is
    ``(perim(A)+perim(B)-perim(A∪B))/2``; ties break on ascending id
    like the reference's stable sort."""
    e = _checkpointed_slivers(to_eliminate, geometry_col)
    k = keep.select(id_col, geometry_col)

    pairs, _ = candidate_pairs(e, k, geometry_col)
    gl, gr = geometry_col, geometry_col + "__r"

    refine_schema = T.StructType(
        [
            T.StructField("_eid", T.LongType()),
            T.StructField(id_col, keep.schema[id_col].dataType),
            T.StructField("_shared", T.DoubleType()),
            T.StructField("_egeom", T.BinaryType()),
        ]
    )

    def refine(it):
        for pdf in it:
            if not len(pdf):
                continue
            ga = wkb.decode(pdf[gl].tolist())
            gb = wkb.decode(pdf[gr].tolist())
            eids, ids, shared, geoms = [], [], [], []
            for i in range(len(pdf)):
                pa = ga.geom_parts(i)
                pb = gb.geom_parts(i)
                if not pa or not pb:
                    continue
                u = union_all([pa, pb])
                s = (_perimeter(pa) + _perimeter(pb) - _perimeter(u)) / 2.0
                if s > 1e-9:
                    eids.append(pdf["_eid"].iloc[i])
                    ids.append(pdf[id_col + "__r"].iloc[i])
                    shared.append(float(s))
                    geoms.append(pdf[gl].iloc[i])
            yield pd.DataFrame(
                {"_eid": eids, id_col: ids, "_shared": shared, "_egeom": geoms}
            )

    cand = pairs.mapInPandas(refine, schema=refine_schema)
    w = Window.partitionBy("_eid").orderBy(F.desc("_shared"), F.asc(id_col))
    chosen = (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("_eid", id_col, "_egeom")
    )
    return _merge_into_keepers(keep, e, chosen, id_col, geometry_col, remove_isolated)


def eliminate_by_largest(
    keep: DataFrame,
    to_eliminate: DataFrame,
    id_col: str = "pid",
    geometry_col: str = "geometry",
    remove_isolated: bool = False,
) -> DataFrame:
    """Merge each sliver into its largest intersecting keeper
    (reference ``polygon_operations.py:290-380``)."""
    return _eliminate(
        keep, to_eliminate, id_col, geometry_col, largest=True,
        remove_isolated=remove_isolated,
    )


def eliminate_by_smallest(
    keep: DataFrame,
    to_eliminate: DataFrame,
    id_col: str = "pid",
    geometry_col: str = "geometry",
    remove_isolated: bool = False,
) -> DataFrame:
    """Merge each sliver into its smallest intersecting keeper
    (reference ``polygon_operations.py:383-434``)."""
    return _eliminate(
        keep, to_eliminate, id_col, geometry_col, largest=False,
        remove_isolated=remove_isolated,
    )
