"""Reference flat-API parity layer (compat.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ssb_sgis_spark import compat
from tests.conftest import spark  # noqa: F401


def _boxes_df(spark):
    from ssb_sgis_spark.kernels import wkb

    def box(x0, y0, x1, y1):
        return wkb.encode_polygon(
            [np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], float)]
        )

    rows = [(i, bytearray(box(i, 0, i + 1, 2))) for i in range(4)]
    return spark.createDataFrame(rows, "gid long, geometry binary")


def test_get_geom_type_and_single(spark):
    boxes = _boxes_df(spark)
    assert compat.get_geom_type(boxes) == "polygon"
    assert compat.is_single_geom_type(boxes)

    from ssb_sgis_spark.operators.geomtable import xy_to_point_wkb

    pts = xy_to_point_wkb(spark.createDataFrame([(1, 1.0, 2.0)], "pid long, x double, y double"))
    mixed = boxes.select("geometry").unionByName(pts.select("geometry"))
    assert compat.get_geom_type(mixed) == "mixed"
    assert not compat.is_single_geom_type(mixed)


def test_to_bbox_variants(spark):
    assert compat.to_bbox((1, 2, 3, 4)) == (1.0, 2.0, 3.0, 4.0)
    assert compat.to_bbox({"minx": [1, 0], "miny": 2, "maxx": [3, 9], "maxy": 4}) == (0, 2, 9, 4)
    assert compat.to_bbox({"xmin": 1, "ymin": 2, "xmax": 3, "ymax": 4}) == (1, 2, 3, 4)
    bb = compat.to_bbox(_boxes_df(spark))
    assert bb == (0.0, 0.0, 4.0, 2.0)
    with pytest.raises(ValueError):
        compat.to_bbox("nope")


def test_crs_tracking_and_common(spark):
    df = compat.set_crs(_boxes_df(spark), "EPSG:25833")
    assert compat.get_crs(df) == "EPSG:25833"
    other = compat.set_crs(_boxes_df(spark), "EPSG:25833")
    assert compat.get_common_crs([df, other]) == "EPSG:25833"
    bare = _boxes_df(spark)  # no crs -> ignored unless strict
    assert compat.get_common_crs([df, bare]) == "EPSG:25833"
    with pytest.raises(ValueError):
        compat.get_common_crs([df, bare], strict=True)
    conflicting = compat.set_crs(_boxes_df(spark), "EPSG:4326")
    with pytest.raises(ValueError):
        compat.get_common_crs([df, conflicting])


def test_geometry_bookkeeping(spark):
    df = _boxes_df(spark).withColumn("old_geom", F.col("geometry")).withColumn(
        "html", F.col("geometry")
    )
    cleaned = compat.drop_inactive_geometry_columns(df)
    # drops the inactive geometry-NAMED binary col, keeps payload binaries
    assert set(cleaned.columns) == {"gid", "geometry", "html"}

    renamed = compat.rename_geometry_if(
        _boxes_df(spark).withColumnRenamed("geometry", "geom_wkb")
    )
    assert "geometry" in renamed.columns
    with pytest.raises(ValueError):
        compat.rename_geometry_if(
            df.withColumnRenamed("geometry", "geom_a").withColumnRenamed(
                "old_geom", "geom_b"
            )
        )


def test_random_points_deterministic_uniform(spark):
    a = compat.random_points(spark, 500, loc=100.0).toPandas().sort_values("pid")
    b = compat.random_points(spark, 500, loc=100.0).toPandas().sort_values("pid")
    assert np.array_equal(a["x"].to_numpy(), b["x"].to_numpy())
    assert a["x"].between(0, 200).all() and a["y"].between(0, 200).all()
    assert {"pid", "x", "y", "geometry"} <= set(a.columns)
    # roughly uniform: mean near loc
    assert abs(a["x"].mean() - 100) < 15


def test_k_nearest_neighbors_array_api():
    rng = np.random.default_rng(5)
    fa = rng.uniform(0, 10, (20, 2))
    ta = rng.uniform(0, 10, (50, 2))
    out = compat.k_nearest_neighbors(fa, ta, k=4)
    assert len(out) == 20 * 4
    for i in range(20):
        d = np.hypot(fa[i, 0] - ta[:, 0], fa[i, 1] - ta[:, 1])
        want = np.lexsort((np.arange(len(ta)), d))[:4]
        got = out[out["i"] == i].sort_values("k")["j"].to_numpy()
        assert list(got) == list(want)


def test_parallel_spark_backend(spark):
    p = compat.Parallel(4)
    assert p.map(lambda x: x * 2, [1, 2, 3]) == [2, 4, 6]
    assert p.starmap(lambda a, b: a + b, [(1, 2), (3, 4)]) == [3, 7]
    assert compat.Parallel(1).map(lambda x: x + 1, [1]) == [2]
    assert p.map(lambda x: x, []) == []


def test_opener_roundtrip(tmp_path):
    f = tmp_path / "x.bin"
    f.write_bytes(b"abc")
    with compat.opener(str(f)) as fh:
        assert fh.read() == b"abc"


def test_elevation_raster_refuses_stripped(spark):
    from ssb_sgis_spark.sources.geotiff import GeoTiffMeta

    meta = GeoTiffMeta(
        path="x.tif", width=64, height=64, dtype="<i4", compression=1,
        predictor=1, tile_w=64, tile_h=8, tiled=False, offsets=[0],
        bytecounts=[0], x0=0.0, y1=64.0, cell=1.0, nodata=None,
    )
    r = compat.ElevationRaster(spark, meta)
    with pytest.raises(NotImplementedError, match="square"):
        r.gradient()


def test_elevation_raster_gradient_real_file(spark, tmp_path):
    """ElevationRaster.gradient over a real square-tiled GeoTIFF: a plane
    z = 3x has |dz/dx| = 3 everywhere (interior cells exact)."""
    from ssb_sgis_spark.sources.geotiff import write_geotiff

    n = 32
    xs = np.arange(n, dtype=np.int64)
    arr = np.tile(3 * xs, (n, 1)).astype(np.int32)  # z = 3 * x, south-up rows
    p = str(tmp_path / "plane.tif")
    write_geotiff(p, arr, 0.0, float(n), 1.0, compression="none", tile=16)

    r = compat.ElevationRaster.from_path(spark, p)
    assert isinstance(r, compat.ElevationRaster)  # from_path respects cls
    grad = r.gradient().toPandas()
    assert len(grad) > 0
    vals = np.concatenate([
        np.frombuffer(bytes(b), dtype="<f8") for b in grad["payload"]
    ])
    # np.gradient on z=3x: every cell's |d/dx|+|d/dy| == 3 (edges included
    # because the x-gradient is linear and y-gradient is 0)
    assert np.allclose(vals, 3.0)
