"""NetworkAnalysis facade + generic get_neighbor_indices."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ssb_sgis_spark.kernels import wkb
from ssb_sgis_spark.sources.roads import NX, node_xy, roads_df

OX, OY = 300000.0, 6600000.0


def box_ring(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float
    )


def test_network_analysis_facade_od(spark):
    """Unit-weight lattice via the facade: off-network origins snap to
    their nearest node (zero-weight connector), costs stay Manhattan."""
    from ssb_sgis_spark.operators.networkanalysis import (
        NetworkAnalysis,
        NetworkAnalysisRules,
    )

    lines = roads_df(spark).withColumn("wt", F.lit(1.0))
    na = NetworkAnalysis(
        lines, NetworkAnalysisRules(weight="wt", search_tolerance=500.0)
    )
    # origins/destinations 10m off their lattice nodes
    ox, oy = node_xy(2, 3)
    dx, dy = node_xy(7, 9)
    orig = spark.createDataFrame([(0, ox + 10.0, oy + 10.0)], "origin long, x double, y double")
    dest = spark.createDataFrame([(1, dx - 10.0, dy - 10.0)], "destination long, x double, y double")
    got = na.od_cost_matrix(orig, dest).collect()
    assert len(got) == 1
    assert got[0]["cost"] == pytest.approx(abs(7 - 2) + abs(9 - 3))

    route = na.get_route(orig, dest).collect()
    assert len(route) == abs(7 - 2) + abs(9 - 3)  # unit edges


def test_network_analysis_weight_validation(spark):
    from ssb_sgis_spark.operators.networkanalysis import (
        NetworkAnalysis,
        NetworkAnalysisRules,
    )

    lines = roads_df(spark).withColumn(
        "wt", F.when(F.col("road_id") % 100 == 0, F.lit(None)).otherwise(F.lit(1.0))
    )
    na = NetworkAnalysis(lines, NetworkAnalysisRules(weight="wt"))
    orig = spark.createDataFrame([(0, *node_xy(0, 0))], "origin long, x double, y double")
    dest = spark.createDataFrame([(1, *node_xy(1, 0))], "destination long, x double, y double")
    with pytest.raises(ValueError, match="NaN"):
        na.od_cost_matrix(orig, dest)


def test_generic_neighbor_indices(spark):
    from ssb_sgis_spark.operators.neighbors import get_neighbor_indices

    left = spark.createDataFrame(
        [
            (0, bytearray(wkb.encode_polygon([box_ring(OX, OY, OX + 10, OY + 10)]))),
            (1, bytearray(wkb.encode_polygon([box_ring(OX + 50, OY, OX + 60, OY + 10)]))),
        ],
        "lid long, geometry binary",
    )
    right = spark.createDataFrame(
        [
            # overlaps left 0
            (10, bytearray(wkb.encode_polygon([box_ring(OX + 5, OY + 5, OX + 20, OY + 20)]))),
            # 5m right of left 1
            (11, bytearray(wkb.encode_polygon([box_ring(OX + 65, OY, OX + 70, OY + 10)]))),
            # contains left 0
            (12, bytearray(wkb.encode_polygon([box_ring(OX - 5, OY - 5, OX + 15, OY + 15)]))),
        ],
        "rid long, geometry binary",
    )
    inter = {(r["lid"], r["rid"]) for r in get_neighbor_indices(left, right, "lid", "rid").collect()}
    assert inter == {(0, 10), (0, 12)}
    near = {(r["lid"], r["rid"]) for r in get_neighbor_indices(
        left, right, "lid", "rid", max_distance=6.0
    ).collect()}
    assert near == {(0, 10), (0, 12), (1, 11)}
    within = {(r["lid"], r["rid"]) for r in get_neighbor_indices(
        left, right, "lid", "rid", predicate="within"
    ).collect()}
    assert within == {(0, 12)}
