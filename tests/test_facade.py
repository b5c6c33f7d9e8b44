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

    # run log (reference networkanalysis.py:1259-1330): one row per run
    # with method, elapsed, counts, percent_missing and the rules
    log = na.log_df(spark).collect()
    assert [r["method"] for r in log] == ["od_cost_matrix", "get_route"]
    od_row = log[0]
    assert od_row["origins_count"] == 1 and od_row["destinations_count"] == 1
    assert od_row["percent_missing"] == 0.0
    assert od_row["cost_mean"] == pytest.approx(abs(7 - 2) + abs(9 - 3))
    assert od_row["weight"] == "wt" and od_row["search_tolerance"] == 500.0
    assert od_row["minutes_elapsed"] >= 0.0


def test_network_analysis_search_factor_k50(spark):
    """search_factor > 0 widens the connector search to up to 50
    candidate nodes (reference networkanalysis.py:127) — on a lattice,
    a point equidistant-ish from several nodes must still route through
    the cheapest connector pair, not just its single nearest node."""
    from ssb_sgis_spark.operators.networkanalysis import (
        CONNECT_K,
        NetworkAnalysis,
        NetworkAnalysisRules,
    )

    assert CONNECT_K == 50
    lines = roads_df(spark).withColumn("wt", F.lit(1.0))
    na = NetworkAnalysis(
        lines,
        NetworkAnalysisRules(weight="wt", search_tolerance=500.0, search_factor=50.0),
        log=False,
    )
    ox, oy = node_xy(2, 3)
    dx, dy = node_xy(4, 3)
    orig = spark.createDataFrame(
        [(0, ox + 10.0, oy + 10.0)], "origin long, x double, y double"
    )
    dest = spark.createDataFrame(
        [(1, dx - 10.0, dy - 10.0)], "destination long, x double, y double"
    )
    got = na.od_cost_matrix(orig, dest).collect()
    assert len(got) == 1
    # zero-weight connectors: min over candidate pairs = Manhattan cost
    assert got[0]["cost"] == pytest.approx(2.0)


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
