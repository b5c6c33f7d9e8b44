"""PolygonsAsRings (operators/rings.py; reference polygons_as_rings.py:62-277)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ssb_sgis_spark.kernels import wkb
from ssb_sgis_spark.kernels.boolean import polygon_area
from ssb_sgis_spark.operators.rings import PolygonsAsRings
from tests.conftest import spark  # noqa: F401

OX, OY = 250_000.0, 6_600_000.0


def ring(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], float)


@pytest.fixture()
def donut_df(spark):
    """Two polygons: a donut (10x10 with 2x2 hole) and a plain 4x4 box."""
    donut = wkb.encode_polygon(
        [ring(OX, OY, OX + 10, OY + 10), ring(OX + 4, OY + 4, OX + 6, OY + 6)]
    )
    box = wkb.encode_polygon([ring(OX + 20, OY, OX + 24, OY + 4)])
    return spark.createDataFrame(
        [(1, "donut", bytearray(donut)), (2, "box", bytearray(box))],
        "pid long, name string, geometry binary",
    )


def test_identity_roundtrip(donut_df):
    out = PolygonsAsRings(donut_df).to_polygons().orderBy("pid").collect()
    src = donut_df.orderBy("pid").collect()
    assert [r["name"] for r in out] == ["donut", "box"]
    for a, b in zip(out, src):
        ga = wkb.decode([a["geometry"]])
        gb = wkb.decode([b["geometry"]])
        assert polygon_area(ga.geom_parts(0)) == pytest.approx(
            polygon_area(gb.geom_parts(0))
        )


def test_get_rings(donut_df):
    rows = PolygonsAsRings(donut_df).get_rings().collect()
    assert len(rows) == 3  # 2 exterior + 1 interior
    assert sum(r["is_exterior"] for r in rows) == 2
    names = {r["name"] for r in rows}
    assert names == {"donut", "box"}


def test_apply_numpy_func_scales_all_rings(donut_df):
    """Scale every ring 2x about the origin corner -> area x4."""

    def scale(coords):
        return [
            np.column_stack([(c[:, 0] - OX) * 2 + OX, (c[:, 1] - OY) * 2 + OY])
            for c in coords
        ]

    out = (
        PolygonsAsRings(donut_df).apply_numpy_func(scale).to_polygons()
        .orderBy("pid").collect()
    )
    ga = wkb.decode([out[0]["geometry"]])
    # donut: (100 - 4) * 4
    assert polygon_area(ga.geom_parts(0)) == pytest.approx(96 * 4)
    gb = wkb.decode([out[1]["geometry"]])
    assert polygon_area(gb.geom_parts(0)) == pytest.approx(16 * 4)


def test_apply_to_interiors_only(donut_df):
    """Drop all interiors -> donut closes to a full square; box untouched."""
    out = (
        PolygonsAsRings(donut_df)
        .apply_numpy_func_to_interiors(lambda coords: [None for _ in coords])
        .to_polygons().orderBy("pid").collect()
    )
    ga = wkb.decode([out[0]["geometry"]])
    assert polygon_area(ga.geom_parts(0)) == pytest.approx(100.0)
    gb = wkb.decode([out[1]["geometry"]])
    assert polygon_area(gb.geom_parts(0)) == pytest.approx(16.0)


def test_apply_df_func_filter(donut_df):
    """DataFrame-level stage: drop tiny rings via a native filter on ring
    bbox — the Spark analogue of apply_gdf_func."""

    def drop_small(rings_df):
        from ssb_sgis_spark.operators.geomtable import with_bounds

        b = with_bounds(rings_df, "geometry")
        keep = b.filter(
            ~((F.col("maxx") - F.col("minx") < 3) & (F.col("maxy") - F.col("miny") < 3))
            | F.col("is_exterior")
        )
        return keep.select("_rkey", "_part", "_ring", "is_exterior", "geometry")

    out = (
        PolygonsAsRings(donut_df).apply_df_func(drop_small).to_polygons()
        .orderBy("pid").collect()
    )
    ga = wkb.decode([out[0]["geometry"]])
    assert polygon_area(ga.geom_parts(0)) == pytest.approx(100.0)  # hole gone


def test_apply_df_func_guard(donut_df):
    with pytest.raises(ValueError, match="lost columns"):
        PolygonsAsRings(donut_df).apply_df_func(lambda r: r.drop("_part"))
