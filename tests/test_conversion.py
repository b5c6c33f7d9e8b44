"""Conversion surface tests — the reference's to_gdf ingestion
(conversion.py:120-350) re-expressed as column operators + a driver
convenience, round-tripped on the reference's own gdf_fixture WKTs
(reference tests/conftest.py:65-101)."""

import json

import numpy as np
import pytest

from ssb_sgis_spark.kernels import wkb
from ssb_sgis_spark.operators.conversion import (
    geojson_to_wkb,
    to_geom_df,
    wkb_to_wkt,
    wkt_to_wkb,
)

# the reference gdf_fixture geometries, verbatim (conftest.py:65-101)
_XS = [10.7497196, 10.7484624, 10.7480624, 10.7384624, 10.7374624, 10.7324624, 10.7284624]
_YS = [59.9281407, 59.9275268, 59.9272268, 59.9175268, 59.9165268, 59.9365268, 59.9075268]
FIXTURE_WKTS = (
    [f"POINT ({x} {y})" for x, y in zip(_XS, _YS)]
    + [
        "LINESTRING ("
        "10.7284623 59.9075267, "
        "10.7184623 59.9175267, "
        "10.7114623 59.9135267, "
        "10.7143623 59.8975267, "
        "10.7384623 59.900000, "
        "10.720000 59.9075200)"
    ]
    + [
        "POLYGON (("
        "10.74 59.92, 10.735 59.915, "
        "10.73 59.91, 10.725 59.905, "
        "10.72 59.9, 10.72 59.91, "
        "10.72 59.91, 10.74 59.92))"
    ]
)


def test_fixture_wkts_roundtrip_byte_stable(spark):
    """WKT -> WKB -> decode -> re-encode must be byte-identical, and the
    parsed coordinates must equal the fixture's literal values."""
    df = spark.createDataFrame([(i, w) for i, w in enumerate(FIXTURE_WKTS)], "i long, wkt string")
    out = wkt_to_wkb(df, "wkt").orderBy("i").collect()
    assert len(out) == 9
    bufs = [bytes(r["geometry"]) for r in out]
    ga = wkb.decode(bufs)
    reenc = wkb.encode(ga)
    assert [bytes(b) for b in reenc] == bufs  # byte-for-byte
    # coordinate parity on the points
    for i in range(7):
        ring = ga.geom_rings(i)[0]
        assert ring[0][0] == _XS[i] and ring[0][1] == _YS[i]
    # line vertex count + polygon closure
    assert len(ga.geom_rings(7)[0]) == 6
    poly_ring = ga.geom_rings(8)[0]
    assert (poly_ring[0] == poly_ring[-1]).all()


def test_wkt_wkb_wkt_text_roundtrip(spark):
    """WKB -> WKT -> WKB parses back to identical bytes for every
    fixture geometry (text formatting is repr-shortest, so the re-parse
    recovers exactly the same doubles)."""
    df = to_geom_df(spark, FIXTURE_WKTS)
    txt = wkb_to_wkt(df, "geometry", "wkt")
    back = wkt_to_wkb(txt.drop("geometry"), "wkt", "geometry")
    a = [bytes(r["geometry"]) for r in df.orderBy("idx").collect()]
    b = [bytes(r["geometry"]) for r in back.orderBy("idx").collect()]
    assert a == b


def test_geojson_ingest_matches_wkt(spark):
    gj = [
        json.dumps({"type": "Point", "coordinates": [_XS[0], _YS[0]]}),
        json.dumps(
            {
                "type": "Feature",
                "properties": {},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[10.74, 59.92], [10.72, 59.9], [10.73, 59.91], [10.74, 59.92]]
                    ],
                },
            }
        ),
    ]
    df = spark.createDataFrame([(i, g) for i, g in enumerate(gj)], "i long, gj string")
    out = geojson_to_wkb(df, "gj").orderBy("i").collect()
    ga = wkb.decode([bytes(r["geometry"]) for r in out])
    assert ga.types[0] == wkb.T_POINT and ga.types[1] == wkb.T_POLYGON
    assert ga.geom_rings(0)[0][0][0] == _XS[0]


def test_to_geom_df_mixed_inputs(spark):
    items = [
        "POINT (1.5 2.5)",                      # wkt
        wkb.encode_point(3.0, 4.0),             # wkb bytes
        (5.0, 6.0),                             # coordinate pair
        {"type": "Point", "coordinates": [7.0, 8.0]},  # geojson dict
    ]
    df = to_geom_df(spark, items)
    ga = wkb.decode([bytes(r["geometry"]) for r in df.orderBy("idx").collect()])
    got = [tuple(ga.geom_rings(i)[0][0]) for i in range(4)]
    assert got == [(1.5, 2.5), (3.0, 4.0), (5.0, 6.0), (7.0, 8.0)]


def test_multiline_multipolygon_wkt_writer(spark):
    wkts = [
        "MULTILINESTRING ((0.0 0.0, 1.0 1.0), (2.0 2.0, 3.0 3.0))",
        "MULTIPOLYGON (((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 0.0)), ((5.0 5.0, 6.0 5.0, 6.0 6.0, 5.0 5.0)))",
        "MULTIPOINT ((1.0 2.0), (3.0 4.0))",
    ]
    df = to_geom_df(spark, wkts)
    txt = [r["wkt"] for r in wkb_to_wkt(df).orderBy("idx").collect()]
    back = [wkb.parse_wkt(t) for t in txt]
    orig = [bytes(r["geometry"]) for r in df.orderBy("idx").collect()]
    assert [bytes(b) for b in back] == orig


# ---------------------------------------------------------------------------
# CRS transforms (reference conversion.py:59-72 via kernels/proj.py)
# ---------------------------------------------------------------------------

from ssb_sgis_spark.kernels import proj
from ssb_sgis_spark.operators.conversion import (
    coordinate_array,
    get_lonlat,
    get_utm33,
    project_to_lonlat,
    project_to_utm33,
)


def test_utm33_meridian_arc_anchor():
    """Absolute (not just roundtrip) correctness: on the central meridian
    the northing is k0 * meridian arc.  GRS80 meridian distance to 60N is
    6,654,072.82 m (standard geodesy tables); x 0.9996 = 6,651,411.19."""
    e, n = get_utm33(15.0, 60.0)
    assert e == 500_000.0
    assert abs(n - 6_651_411.19) < 0.01
    # equator -> northing 0
    e0, n0 = get_utm33(15.0, 0.0)
    assert abs(n0) < 1e-6 and e0 == 500_000.0


def test_utm33_roundtrip_ulp_level():
    rng = np.random.default_rng(7)
    lon = rng.uniform(4.0, 32.0, 1000)   # Norway-ish zone-33 extent
    lat = rng.uniform(57.0, 71.0, 1000)
    e, n = proj.lonlat_to_utm33(lon, lat)
    lon2, lat2 = proj.utm33_to_lonlat(e, n)
    # 1e-9 deg ~ 0.1 mm
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_get_utm33_scalar_and_array_shapes():
    e, n = get_utm33(10.0, 59.0)
    assert isinstance(e, float) and isinstance(n, float)
    ea, na = get_utm33(np.array([10.0, 11.0]), np.array([59.0, 60.0]))
    assert ea.shape == (2,) and na.shape == (2,)
    lon, lat = get_lonlat(e, n)
    assert abs(lon - 10.0) < 1e-9 and abs(lat - 59.0) < 1e-9
    with pytest.raises(NotImplementedError):
        get_utm33(10.0, 59.0, crs=32633)


def test_project_cols_spark_matches_kernel(spark):
    lon = [5.5, 10.75, 20.0, 30.9]
    lat = [58.0, 59.91, 65.5, 70.9]
    df = spark.createDataFrame(list(zip(lon, lat)), "lon double, lat double")
    rows = project_to_utm33(df).orderBy("lon").collect()
    e, n = proj.lonlat_to_utm33(np.array(lon), np.array(lat))
    got_e = np.array([r.x for r in rows])
    got_n = np.array([r.y for r in rows])
    # Arrow batch path must be bit-identical to the driver kernel
    assert np.array_equal(got_e, e) and np.array_equal(got_n, n)
    back = project_to_lonlat(project_to_utm33(df)).orderBy("lon").collect()
    assert np.abs(np.array([r["lon"] for r in back]) - np.array(lon)).max() < 1e-9


def test_coordinate_array_points_and_non_points(spark):
    gdf = to_geom_df(spark, ["POINT (1 2)", "POLYGON ((0 0, 1 0, 1 1, 0 0))", "POINT (3 4)"])
    arr = coordinate_array(gdf)
    assert arr.shape == (3, 2)
    assert list(arr[0]) == [1.0, 2.0]
    assert np.isnan(arr[1]).all()
    assert list(arr[2]) == [3.0, 4.0]


# ---------------------------------------------------------------------------
# Multi-CRS (round 4): parameterized Krüger kernel — UTM zones 32/34/35
# (EPSG:25832/25834/25835), Web-Mercator (EPSG:3857), get_common_crs
# (reference general.py:28-77), and the any-to-any transform_coords path.
# ---------------------------------------------------------------------------

import duckdb

from ssb_sgis_spark.operators.conversion import (
    get_common_crs,
    register_utm_crs,
    transform_coords,
    transform_coords_np,
)


@pytest.mark.parametrize("zone,lon_lo,lon_hi", [(32, 3.0, 12.0), (34, 15.0, 24.0), (35, 21.0, 30.0)])
def test_utm_zone_roundtrip_ulp_level(zone, lon_lo, lon_hi):
    """Mirrors test_utm33_roundtrip_ulp_level for the other Norwegian
    zones: forward+inverse must agree to ~0.1 mm over the zone extent."""
    rng = np.random.default_rng(zone)
    lon = rng.uniform(lon_lo, lon_hi, 1000)
    lat = rng.uniform(55.0, 72.0, 1000)
    e, n = proj.lonlat_to_utm(lon, lat, zone)
    lon2, lat2 = proj.utm_to_lonlat(e, n, zone)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_utm_zone_meridian_anchor():
    """On each zone's own central meridian the easting is exactly the
    false easting and the northing equals the zone-33 value (the meridian
    arc depends only on latitude)."""
    _, n33 = proj.lonlat_to_utm(15.0, 60.0, 33)
    for zone in (32, 34, 35):
        lon0 = proj.utm_zone_lon0(zone)
        e, n = proj.lonlat_to_utm(lon0, 60.0, zone)
        assert e == 500_000.0
        assert abs(n - n33) < 1e-9
    with pytest.raises(ValueError):
        proj.utm_zone_lon0(0)


def test_webmercator_anchors_and_roundtrip():
    # lon 180 -> the canonical 20037508.342789244 m bound; equator -> y=0
    x, y = proj.lonlat_to_webmercator(180.0, 0.0)
    assert abs(x - 20037508.342789244) < 1e-6 and y == 0.0
    rng = np.random.default_rng(3)
    lon = rng.uniform(-179.0, 179.0, 1000)
    lat = rng.uniform(-84.0, 84.0, 1000)
    lon2, lat2 = proj.webmercator_to_lonlat(*proj.lonlat_to_webmercator(lon, lat))
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_get_common_crs_reference_semantics():
    class _Obj:
        def __init__(self, crs):
            self.crs = crs

    assert get_common_crs(25833, None, _Obj(25833)) == 25833
    with pytest.raises(ValueError):
        get_common_crs(25832, 25833)
    with pytest.raises(ValueError):
        get_common_crs(None, None)
    assert get_common_crs(None, strict=False) is None


def test_register_utm_crs_and_any_to_any():
    # WGS84/UTM33 (EPSG:32633): GRS80 vs WGS84 is sub-mm, same kernel
    register_utm_crs(32633, 33)
    e, n = transform_coords_np(10.75, 59.91, 4326, 32633)
    e33, n33 = proj.lonlat_to_utm33(10.75, 59.91)
    assert float(e) == float(e33) and float(n) == float(n33)
    # 25833 -> 25832 composes inverse(33) then forward(32)
    e32, n32 = transform_coords_np(np.array([e33]), np.array([n33]), 25833, 25832)
    lon, lat = proj.utm_to_lonlat(e32, n32, 32)
    assert abs(float(lon) - 10.75) < 1e-9 and abs(float(lat) - 59.91) < 1e-9
    with pytest.raises(NotImplementedError):
        transform_coords_np(0.0, 0.0, 4326, 99999)


def test_transform_coords_spark_matches_kernel(spark):
    lon = [5.5, 10.75, 20.0, 30.9]
    lat = [58.0, 59.91, 65.5, 70.9]
    df = spark.createDataFrame(list(zip(lon, lat)), "x double, y double")
    for to_crs in (25832, 25834, 3857):
        rows = transform_coords(df, 4326, to_crs).orderBy("x").collect()
        # orderBy("x") on the OUTPUT x: monotone with lon for all these CRS
        ex, ey = transform_coords_np(np.array(lon), np.array(lat), 4326, to_crs)
        assert np.array_equal(np.array([r.x for r in rows]), ex)
        assert np.array_equal(np.array([r.y for r in rows]), ey)
    # same-CRS is a typed no-op
    same = transform_coords(df, 25833, 25833).orderBy("x").collect()
    assert [r.x for r in same] == sorted(lon)


def test_tm_forward_sql_mirror_tracks_kernel():
    """The DuckDB mirror of the forward Krüger series (hyperbolics via
    exp/ln) must track the numpy kernel to nanometres — that is what
    makes the reproject oracle query hash-stable at cm rounding."""
    rng = np.random.default_rng(11)
    lon = rng.uniform(3.0, 31.0, 5000)
    lat = rng.uniform(55.0, 72.0, 5000)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest(?) AS lon, unnest(?) AS lat",
        [lon.tolist(), lat.tolist()],
    )
    for zone in (32, 33, 35):
        lon0 = proj.utm_zone_lon0(zone)
        esql, nsql = proj.tm_forward_sql("lon", "lat", lon0)
        got = con.execute(f"SELECT {esql} AS e, {nsql} AS n FROM t").fetchnumpy()
        e, n = proj.lonlat_to_tm(lon, lat, lon0)
        assert np.abs(got["e"] - e).max() < 1e-7
        assert np.abs(got["n"] - n).max() < 1e-7
    xs, ys = proj.webmercator_forward_sql("lon", "lat")
    got = con.execute(f"SELECT {xs} AS x, {ys} AS y FROM t").fetchnumpy()
    x, y = proj.lonlat_to_webmercator(lon, lat)
    assert np.abs(got["x"] - x).max() < 1e-7
    assert np.abs(got["y"] - y).max() < 1e-7


# ---------------------------------------------------------------------------
# LAEA (round 5): ETRS89-LAEA EPSG:3035 — the pan-European equal-area
# grid (reference reaches it through pyproj, general.py:28-77).
# ---------------------------------------------------------------------------


def test_laea_epsg_guidance_note_test_point():
    """Absolute anchor: the worked example in EPSG/IOGP Guidance Note
    7-2 for ETRS89-LAEA — 50N 5E -> E 3962799.45, N 2999718.85."""
    e, n = proj.lonlat_to_laea(5.0, 50.0)
    assert abs(e - 3_962_799.45) < 0.01
    assert abs(n - 2_999_718.85) < 0.01
    # projection centre maps exactly to the false origin
    assert proj.lonlat_to_laea(10.0, 52.0) == (4_321_000.0, 3_210_000.0)


def test_laea_roundtrip_ulp_level():
    rng = np.random.default_rng(35)
    lon = rng.uniform(-10.0, 35.0, 1000)   # pan-European extent
    lat = rng.uniform(34.0, 72.0, 1000)
    e, n = proj.lonlat_to_laea(lon, lat)
    lon2, lat2 = proj.laea_to_lonlat(e, n)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_laea_is_equal_area():
    """The defining property, checked independently of any formula: the
    finite-difference Jacobian determinant must equal the ellipsoidal
    area element a^2 (1-e^2) cos(phi) / (1 - e^2 sin^2 phi)^2 per
    square radian — areal scale 1 everywhere."""
    a, f = 6378137.0, 1.0 / 298.257222101
    e2 = f * (2.0 - f)
    h = 1e-5
    for lon, lat in [(5.0, 40.0), (10.0, 52.0), (25.0, 65.0), (-8.0, 37.0)]:
        x0, y0 = proj.lonlat_to_laea(lon, lat)
        xl, yl = proj.lonlat_to_laea(lon + h, lat)
        xp, yp = proj.lonlat_to_laea(lon, lat + h)
        det = abs((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0))
        hr = np.radians(h)
        s = np.sin(np.radians(lat))
        truth = (
            a * a * (1.0 - e2) * np.cos(np.radians(lat))
            / (1.0 - e2 * s * s) ** 2 * hr * hr
        )
        assert abs(det / truth - 1.0) < 1e-4


def test_laea_registry_and_spark_path(spark):
    lon = [5.0, 10.0, 25.3, -3.7]
    lat = [50.0, 52.0, 61.2, 40.1]
    df = spark.createDataFrame(list(zip(lon, lat)), "lon double, lat double")
    out = transform_coords(df, 4326, 3035, "lon", "lat", "e", "n")
    rows = out.orderBy("lon").collect()
    order = np.argsort(lon)
    e, n = proj.lonlat_to_laea(np.array(lon)[order], np.array(lat)[order])
    # Arrow batch path bit-identical to the driver kernel
    assert np.array_equal(np.array([r.e for r in rows]), e)
    assert np.array_equal(np.array([r.n for r in rows]), n)
    back = transform_coords(out, 3035, 4326, "e", "n", "lon2", "lat2")
    b = back.orderBy("lon").collect()
    assert np.abs(np.array([r.lon2 for r in b]) - np.array(lon)[order]).max() < 1e-9


def test_register_laea_crs_custom_grid():
    from ssb_sgis_spark.operators.conversion import (
        CRS_REGISTRY,
        register_laea_crs,
        transform_coords_np,
    )

    register_laea_crs(990035, lat0=45.0, lon0=0.0, x0=0.0, y0=0.0)
    try:
        e, n = transform_coords_np(np.array([0.0]), np.array([45.0]), 4326, 990035)
        assert abs(e[0]) < 1e-9 and abs(n[0]) < 1e-9
        lon, lat = transform_coords_np(e, n, 990035, 4326)
        assert abs(lon[0]) < 1e-9 and abs(lat[0] - 45.0) < 1e-9
    finally:
        CRS_REGISTRY.pop(990035, None)


def test_laea_duckdb_mirror_tracks_kernel():
    ex, ny = proj.laea_forward_sql("lon", "lat")
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {ex} AS e, {ny} AS n FROM (VALUES (5.0, 50.0), (25.3, 61.2),"
        " (-8.0, 37.0)) t(lon, lat)"
    ).fetchall()
    e, n = proj.lonlat_to_laea(
        np.array([5.0, 25.3, -8.0]), np.array([50.0, 61.2, 37.0])
    )
    for i, (ge, gn) in enumerate(got):
        assert abs(ge - e[i]) < 1e-6 and abs(gn - n[i]) < 1e-6
