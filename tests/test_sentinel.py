"""Sentinel-2 metadata surface (reference raster/sentinel.py:6-43 and the
filename name/date regex machinery in raster/raster.py:766-791)."""

import numpy as np

from ssb_sgis_spark.sources.geotiff import write_geotiff
from ssb_sgis_spark.sources.sentinel import (
    Sentinel2,
    enrich_catalog_headers,
    sentinel2_catalog,
)
from tests.conftest import spark  # noqa: F401


def _tif(tmp_path, fname, h=40, w=50, x0=10_000.0, y1=50_000.0, cell=10.0):
    arr = np.arange(h * w, dtype=np.uint16).reshape(h, w)
    p = str(tmp_path / fname)
    write_geotiff(p, arr, x0, y1, cell)
    return p


def test_facade_metadata(spark, tmp_path):
    p = _tif(tmp_path, "T32VNM_20230601T105031_B04.tif")
    s2 = Sentinel2.from_path(spark, p)
    assert s2.name == "B04"
    assert s2.date == "20230601"
    assert s2.band_color == "red"          # B04 normalized to the B4 row
    assert s2.shortname == "sentinel2"
    assert not s2.is_mask
    # tile is SW corner ints (reference raster.py:749-752)
    assert s2.tile == f"{int(s2.bounds[0])}{int(s2.bounds[1])}"
    assert s2.raster_id == f"sentinel2_{s2.tile}_20230601_B04"
    # still a fully functional Raster facade
    assert s2.load().shape == (40, 50)


def test_facade_b8a_and_mask(spark, tmp_path):
    p = _tif(tmp_path, "masks/T32VNM_20210101_B8A.tif".replace("/", "_"))
    s2 = Sentinel2.from_path(spark, p)
    # path has no real masks dir here; test the predicate directly
    assert s2.name == "B8A"
    assert s2.band_color == "narrow nir"
    assert Sentinel2.is_mask.fget(
        type("M", (), {"meta": type("P", (), {"path": "/lake/Masks/x_B1.tif"})})()
    )


def test_catalog_native_parse_no_io(spark):
    # catalog parses band/date/color from PATH strings alone — files
    # need not exist (that's the point: prune before IO)
    paths = [
        "/lake/s2/T32VNM_20230601_B04.tif",
        "/lake/s2/T32VNM_20230601_B8A.tif",
        "/lake/s2/masks/T32VNM_20230601_SCL.tif",
        "/lake/s2/T33WXP_20210315_B12.tif",
    ]
    rows = {r["path"]: r for r in sentinel2_catalog(spark, paths).collect()}
    assert rows[paths[0]]["band"] == "B04"
    assert rows[paths[0]]["band_color"] == "red"
    assert rows[paths[0]]["date"] == "20230601"
    assert rows[paths[1]]["band"] == "B8A"
    assert rows[paths[1]]["band_color"] == "narrow nir"
    assert rows[paths[2]]["band"] is None
    assert rows[paths[2]]["is_mask"]
    assert rows[paths[3]]["band"] == "B12"
    assert rows[paths[3]]["band_color"] == "swir"


def test_catalog_header_enrichment(spark, tmp_path):
    p1 = _tif(tmp_path, "T1_20230601_B04.tif", h=40, w=50)
    p2 = _tif(tmp_path, "T1_20230601_B08.tif", h=40, w=50, x0=20_000.0)
    cat = sentinel2_catalog(spark, [p1, p2])
    # prune relationally, THEN parse headers of survivors only
    sel = cat.filter(cat.band == "B04")
    out = enrich_catalog_headers(sel).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"], r["cell"]) == (50, 40, 10.0)
    assert r["minx"] == 10_000.0 and r["maxy"] == 50_000.0
    assert r["miny"] == 50_000.0 - 40 * 10.0
    assert r["tile"] == f"{int(r['minx'])}{int(r['miny'])}"
