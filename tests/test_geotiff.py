"""File-backed raster IO (sources/geotiff.py) — writer/reader round-trip,
Spark block-range loader, and the Raster facade (from_path/load/clip/
sample/zonal; reference raster/raster.py:255,417,436,460)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ssb_sgis_spark.kernels import wkb
from ssb_sgis_spark.sources.geotiff import (
    Raster,
    geotiff_tiles_df,
    read_array,
    read_meta,
    write_geotiff,
)
from tests.conftest import spark  # noqa: F401

X0, Y1, CELL = 10_000.0, 50_000.0, 10.0


def _demo(h=100, w=130, dtype=np.int32):
    rng = np.random.default_rng(42)
    if np.issubdtype(dtype, np.floating):
        return rng.normal(size=(h, w)).astype(dtype)
    return rng.integers(0, 1000, size=(h, w)).astype(dtype)


@pytest.mark.parametrize(
    "dtype,compression,predictor",
    [
        (np.int32, "deflate", 1),
        (np.int32, "none", 1),
        (np.uint16, "deflate", 2),
        (np.uint8, "none", 1),
        (np.float32, "deflate", 1),
        (np.float64, "deflate", 1),
    ],
)
def test_roundtrip(tmp_path, dtype, compression, predictor):
    arr = _demo(dtype=dtype)
    p = str(tmp_path / "r.tif")
    write_geotiff(p, arr, X0, Y1, CELL, compression=compression,
                  tile=64, predictor=predictor)
    got, meta = read_array(p)
    np.testing.assert_array_equal(got, arr)
    assert meta.cell == CELL and meta.x0 == X0 and meta.y1 == Y1
    assert meta.bounds == (X0, Y1 - 100 * CELL, X0 + 130 * CELL, Y1)


def test_roundtrip_strips(tmp_path):
    """Strip layout incl. a short last strip (100 rows, 32-row strips)."""
    arr = _demo()
    p = str(tmp_path / "s.tif")
    write_geotiff(p, arr, X0, Y1, CELL, strips=32)
    got, meta = read_array(p)
    np.testing.assert_array_equal(got, arr)
    assert not meta.tiled and meta.tile_h == 32 and meta.tile_w == 130


def test_nodata_tag(tmp_path):
    p = str(tmp_path / "n.tif")
    write_geotiff(p, _demo(), X0, Y1, CELL, nodata=-9999.0)
    assert read_meta(p).nodata == -9999.0


def test_bigtiff_rejected(tmp_path):
    import struct

    p = str(tmp_path / "big.tif")
    with open(p, "wb") as f:
        f.write(struct.pack("<2sH", b"II", 43) + b"\x00" * 12)
    with pytest.raises(ValueError, match="BigTIFF"):
        read_meta(p)


def _assemble(rows, meta):
    """Reassemble the Spark tile frame into a north-first array."""
    out = np.zeros((meta.height, meta.width), dtype=np.int32)
    for r in rows:
        blk = np.frombuffer(bytes(r["payload"]), dtype="<i4").reshape(
            r["ny"], r["nx"]
        )
        # south-up payload rows -> north-first array rows
        iy0, ix0 = r["iy0"], r["ix0"]
        rr = meta.height - (iy0 + r["ny"])
        out[rr : rr + r["ny"], ix0 : ix0 + r["nx"]] = blk[::-1]
    return out


def test_spark_loader_matches_driver_read(spark, tmp_path):
    arr = _demo(h=100, w=130)  # 100 % 64 != 0: exercises edge blocks
    p = str(tmp_path / "r.tif")
    write_geotiff(p, arr, X0, Y1, CELL, tile=64)
    meta = read_meta(p)
    rows = geotiff_tiles_df(spark, p).collect()
    assert len(rows) == meta.ntx * meta.nty == 3 * 2
    np.testing.assert_array_equal(_assemble(rows, meta), arr)


def test_clip_prunes_before_io(spark, tmp_path):
    arr = _demo(h=128, w=256)
    p = str(tmp_path / "r.tif")
    write_geotiff(p, arr, X0, Y1, CELL, tile=64)
    r = Raster.from_path(spark, p)
    # window over the far-west column of tiles only
    clipped = r.clip((X0, Y1 - 128 * CELL, X0 + 40 * CELL, Y1))
    rows = clipped.tiles().collect()
    assert {row["tile_ix"] for row in rows} == {0}
    assert len(rows) == 2  # of 8 blocks total


def test_sample_matches_array(spark, tmp_path):
    arr = _demo(h=100, w=130)
    p = str(tmp_path / "r.tif")
    write_geotiff(p, arr, X0, Y1, CELL, tile=64)
    r = Raster.from_path(spark, p)
    rng = np.random.default_rng(7)
    xs = X0 + rng.uniform(0, 130 * CELL, 200)
    ys = (Y1 - 100 * CELL) + rng.uniform(0, 100 * CELL, 200)
    pts = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "uid long, x double, y double",
    )
    got = {row["uid"]: row["value"] for row in r.sample(pts).collect()}
    assert len(got) == 200
    for i, (x, y) in enumerate(zip(xs, ys)):
        cix = int((x - X0) / CELL)
        ciy = int((y - (Y1 - 100 * CELL)) / CELL)
        assert got[i] == arr[100 - 1 - ciy, cix], i
    # out-of-extent points drop out
    outside = spark.createDataFrame(
        [(99, X0 - 5.0, Y1 + 5.0)], "uid long, x double, y double"
    )
    assert r.sample(outside).count() == 0


def test_zonal_file_backed(spark, tmp_path):
    """Raster.zonal over a written file == closed-form window sums (the
    polygon covers an exact cell-aligned window, center rule)."""
    arr = _demo(h=100, w=130)
    p = str(tmp_path / "r.tif")
    write_geotiff(p, arr, X0, Y1, CELL, tile=64)
    r = Raster.from_path(spark, p)
    y0 = Y1 - 100 * CELL
    # polygon = cells [10,40) x [20,70) exactly (south-based rows)
    poly = wkb.encode_polygon(
        [
            np.array(
                [
                    (X0 + 10 * CELL, y0 + 20 * CELL),
                    (X0 + 40 * CELL, y0 + 20 * CELL),
                    (X0 + 40 * CELL, y0 + 70 * CELL),
                    (X0 + 10 * CELL, y0 + 70 * CELL),
                    (X0 + 10 * CELL, y0 + 20 * CELL),
                ]
            )
        ]
    )
    polys = spark.createDataFrame(
        [(1, bytearray(poly))], "muni_id long, geometry binary"
    )
    got = r.zonal(polys).collect()
    assert len(got) == 1
    win = arr[::-1][20:70, 10:40]  # south-based rows 20..70
    assert got[0]["n_cells"] == 50 * 30
    assert got[0]["value_sum"] == int(win.astype(np.int64).sum())
    assert got[0]["value_min"] == int(win.min())
    assert got[0]["value_max"] == int(win.max())
    # clip to the polygon bbox first: same answer, fewer blocks read
    clipped = r.clip((X0 + 10 * CELL, y0 + 20 * CELL, X0 + 40 * CELL, y0 + 70 * CELL))
    got2 = clipped.zonal(polys).collect()
    assert got2[0]["value_sum"] == got[0]["value_sum"]
    assert clipped.tiles().count() < r.tiles().count()
