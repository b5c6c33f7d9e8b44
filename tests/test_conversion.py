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
