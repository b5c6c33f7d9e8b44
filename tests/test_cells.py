"""Cell-index layer tests: morton parity (numpy vs Spark column vs SQL),
SSB grid-id parity, and cover soundness/completeness on random points."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ssb_sgis_spark import cells
from ssb_sgis_spark.kernels import geom
from ssb_sgis_spark.sources import municipalities as M


RNG = np.random.RandomState(123)
N = 2000
X = M.MUNI_X0 - 5000 + RNG.rand(N) * (M.MUNI_X1 - M.MUNI_X0 + 10000)
Y = M.MUNI_Y0 - 5000 + RNG.rand(N) * (M.MUNI_Y1 - M.MUNI_Y0 + 10000)


@pytest.mark.parametrize("res", [6, 10, 13, 16])
def test_morton_np_vs_spark_col(spark, res):
    want = cells.cell_of_xy_np(X, Y, res)
    pdf = pd.DataFrame({"x": X, "y": Y})
    got = (
        spark.createDataFrame(pdf)
        .select(cells.cell_of_xy_col(F.col("x"), F.col("y"), res).alias("c"))
        .toPandas()["c"]
        .to_numpy()
    )
    assert (want == got).all()


@pytest.mark.parametrize("res", [6, 13])
def test_morton_np_vs_duckdb_sql(res):
    want = cells.cell_of_xy_np(X, Y, res)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"x": X, "y": Y}))
    got = con.execute(f"select {cells.morton_sql('x', 'y', res)} as c from pts").df()["c"].to_numpy()
    assert (want == got).all()


def test_morton_parent_child():
    c13 = cells.cell_of_xy_np(X, Y, 13)
    c10 = cells.cell_of_xy_np(X, Y, 10)
    assert (cells.cell_parent(c13, 3) == c10).all()


def test_ssb_grid_parity(spark):
    want = cells.ssb_grid_id_np(X, Y, 1000)
    pdf = pd.DataFrame({"x": X, "y": Y})
    got = (
        spark.createDataFrame(pdf)
        .select(cells.ssb_grid_id_col(F.col("x"), F.col("y"), 1000).alias("s"))
        .toPandas()["s"]
        .to_numpy()
    )
    assert (want == got).all()
    con = duckdb.connect()
    con.register("pts", pdf)
    got_sql = con.execute(
        f"select {cells.ssb_grid_id_sql('x', 'y', 1000)} as s from pts"
    ).df()["s"].to_numpy()
    assert (want == got_sql).all()


def test_cover_sound_and_complete():
    """FULL cover cell => every point in it is inside the polygon (sound);
    point inside polygon => its cell is in the cover (complete)."""
    ids, ga = M.muni_geom_array()
    et = M.muni_edge_table()
    res = 11
    covers = cells.covers_for_polygons(ga, res)
    pt_cells = cells.cell_of_xy_np(X, Y, res)
    for g, cover, edges in covers:
        mid = ids[g]
        inside = geom.points_in_polygon(X, Y, et[mid])
        in_full = np.isin(pt_cells, cover.full)
        in_partial = np.isin(pt_cells, cover.partial)
        # sound: full-cell points are truly inside
        assert (inside[in_full]).all(), f"{mid}: full cover contains outside point"
        # complete: inside points are in full or partial cover
        assert (in_full | in_partial)[inside].all(), f"{mid}: inside point missed by cover"
        # no overlap between full and partial
        assert not np.intersect1d(cover.full, cover.partial).size


def test_cover_resolution_picker():
    r = cells.pick_cover_resolution((0, 0, 25000, 25000))
    # ~25 km polygon -> cell ~1.5 km -> res ~12-13
    assert 11 <= r <= 14


def test_cell_pyramid_shift_equals_direct_binning(spark):
    """The pyramid's shift-derived coarse cells must equal binning the
    points DIRECTLY at each coarse resolution (the Morton parent
    identity survives the axis clamping), and per-level mass is total."""
    import numpy as np
    from pyspark.sql import functions as F

    from ssb_sgis_spark.cells import cell_of_xy_col, cell_pyramid

    rng = np.random.default_rng(3)
    n = 4000
    # include points OUTSIDE the domain so the clamp path is exercised
    x = rng.uniform(-1_200_000, 8_000_000, n)
    y = rng.uniform(4_800_000, 14_000_000, n)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    levels = (5, 9, 12)
    out = cell_pyramid(df, levels).collect()
    got = {(r.res, r.cell): r.n_pages for r in out}
    for res in levels:
        direct = (
            df.groupBy(cell_of_xy_col(F.col("x"), F.col("y"), res).alias("c"))
            .agg(F.count("*").alias("n"))
            .collect()
        )
        want = {(res, r.c): r.n for r in direct}
        assert {k: v for k, v in got.items() if k[0] == res} == want
    assert sum(got.values()) == n * len(levels)
