"""Raster bridge: rasterize / vectorize / gradient
(reference raster/raster.py:317-383, 563-623, elevationraster.py:13-87)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ssb_sgis_spark.kernels import wkb
from ssb_sgis_spark.kernels.boolean import polygon_area
from ssb_sgis_spark.operators.raster_ops import (
    raster_gradient,
    raster_to_polygons,
    rasterize_polygons,
)

X0, Y0 = 0.0, 6000000.0
RES = 10.0


def box_ring(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float
    )


def test_rasterize_center_rule_and_replace(spark):
    # 8x8 cells of 10m; polygon A covers x:[0,40), polygon B overlaps x:[30,60)
    polys = spark.createDataFrame(
        [
            (1, bytearray(wkb.encode_polygon([box_ring(X0, Y0, X0 + 40, Y0 + 80)]))),
            (2, bytearray(wkb.encode_polygon([box_ring(X0 + 30, Y0, X0 + 60, Y0 + 80)]))),
        ],
        "val long, geometry binary",
    )
    tiles = rasterize_polygons(polys, "val", RES, X0, Y0, ncx=8, ncy=8, tile=4)
    rows = tiles.collect()
    full = np.zeros((8, 8), dtype=np.int32)
    for r in rows:
        vals = np.frombuffer(bytes(r["payload"]), dtype="<i4").reshape(r["ny"], r["nx"])
        full[
            r["tile_iy"] * 4 : r["tile_iy"] * 4 + r["ny"],
            r["tile_ix"] * 4 : r["tile_ix"] * 4 + r["nx"],
        ] = vals
    # centers at 5,15,25,35 -> A; 35,45,55 -> B replaces A on col 3 (35)
    assert (full[:, 0:3] == 1).all()
    assert (full[:, 3:6] == 2).all()  # col 3 center=35 inside both, B wins
    assert (full[:, 6:] == 0).all()


def test_raster_to_polygons_regions(spark):
    # one 4x4 tile: left half value 7, right half value 9
    vals = np.zeros((4, 4), dtype="<i4")
    vals[:, :2] = 7
    vals[:, 2:] = 9
    tiles = spark.createDataFrame(
        [(0, 0, 4, 4, bytearray(vals.tobytes()))],
        "tile_ix int, tile_iy int, nx int, ny int, payload binary",
    )
    out = raster_to_polygons(tiles, RES, X0, Y0, tile=4).collect()
    got = {(r["value"]): polygon_area(wkb.decode([r["geometry"]]).geom_parts(0)) for r in out}
    assert got == {7: pytest.approx(2 * 4 * RES * RES), 9: pytest.approx(2 * 4 * RES * RES)}


def test_raster_gradient_matches_reference_example(spark):
    """The ElevationRaster.gradient docstring example, split into four
    tiles with halo exchange: output must equal the documented array."""
    arr = np.array(
        [
            [100, 100, 100, 100, 100],
            [100, 110, 110, 110, 100],
            [100, 110, 120, 110, 100],
            [100, 110, 110, 110, 100],
            [100, 100, 100, 100, 100],
        ],
        dtype="<i4",
    )
    want = np.array(
        [
            [0., 1., 1., 1., 0.],
            [1., 1., 1., 1., 1.],
            [1., 1., 0., 1., 1.],
            [1., 1., 1., 1., 1.],
            [0., 1., 1., 1., 0.],
        ]
    )
    TILE = 3
    rows = []
    for ty in range(2):
        for tx in range(2):
            iy0, ix0 = ty * TILE, tx * TILE
            block = arr[iy0 : iy0 + TILE, ix0 : ix0 + TILE]
            if block.size == 0:
                continue
            rows.append(
                (tx, ty, block.shape[1], block.shape[0], bytearray(block.astype("<i4").tobytes()))
            )
    tiles = spark.createDataFrame(
        rows, "tile_ix int, tile_iy int, nx int, ny int, payload binary"
    )
    out = raster_gradient(tiles, res=10.0, tile=TILE).collect()
    got = np.full((5, 5), np.nan)
    for r in out:
        vals = np.frombuffer(bytes(r["payload"]), dtype="<f8").reshape(r["ny"], r["nx"])
        got[
            r["tile_iy"] * TILE : r["tile_iy"] * TILE + r["ny"],
            r["tile_ix"] * TILE : r["tile_ix"] * TILE + r["nx"],
        ] = vals
    np.testing.assert_allclose(got, want)


def test_rasterize_cells_df_matches_tile_path(spark):
    """Fused burn+explode (rasterize_cells_df) == explode of the tiled
    rasterize_polygons output, including the edge (partial) tiles."""
    from ssb_sgis_spark.operators.raster_ops import rasterize_cells_df

    polys = spark.createDataFrame(
        [
            (1, bytearray(wkb.encode_polygon([box_ring(X0, Y0, X0 + 40, Y0 + 80)]))),
            (2, bytearray(wkb.encode_polygon([box_ring(X0 + 30, Y0, X0 + 60, Y0 + 80)]))),
        ],
        "val long, geometry binary",
    )
    # ncx=7, ncy=6 with tile=4 -> partial edge tiles
    cells = rasterize_cells_df(
        polys, "val", RES, X0, Y0, ncx=7, ncy=6, tile=4, fill=0
    ).collect()
    tiles = rasterize_polygons(
        polys, "val", RES, X0, Y0, ncx=7, ncy=6, tile=4, fill=0
    ).collect()
    expect = {}
    for r in tiles:
        vals = np.frombuffer(bytes(r["payload"]), dtype="<i4").reshape(r["ny"], r["nx"])
        jy, jx = np.nonzero(vals != 0)
        for y, x in zip(jy, jx):
            expect[(r["tile_ix"] * 4 + x, r["tile_iy"] * 4 + y)] = int(vals[y, x])
    got = {(r["ix"], r["iy"]): r["value"] for r in cells}
    assert len(cells) == len(got)  # no duplicate cells
    assert got == expect and len(expect) > 0
