"""Geometry ingestion / conversion surface (reference ``to_gdf``,
``sgis/geopandas_tools/conversion.py:120-350``).

The reference's ``to_gdf`` turns "anything geometry-like" — WKT strings,
WKB bytes, (x, y) coordinate pairs, GeoJSON-style dicts, Series/frames
of those — into a GeoDataFrame.  Here the same ingestion exists at two
levels:

* **column operators** (the scale path): ``wkt_to_wkb`` /
  ``geojson_to_wkb`` / ``wkb_to_wkt`` convert a string column on a
  DataFrame of any size through an Arrow-batched pandas UDF (one batch
  parse per Arrow chunk — no per-row Python round trips through the JVM).
* **driver convenience** (the reference's stated use: testing and
  exploring): :func:`to_geom_df` accepts a WKT string, WKB bytes, an
  (x, y) tuple, a GeoJSON dict, or a list/Series of those and returns a
  one-column Spark DataFrame of WKB ``geometry``.

Everything parses through the engine's own WKB codec
(:mod:`..kernels.wkb`), so round trips are byte-stable: WKT -> WKB ->
decode -> re-encode produces identical bytes.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import wkb


def wkt_to_wkb(df: DataFrame, wkt_col: str, out_col: str = "geometry") -> DataFrame:
    """Parse a WKT string column into a WKB binary column (Arrow-batched)."""

    @F.pandas_udf("binary")
    def parse(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else wkb.parse_wkt(v))

    return df.withColumn(out_col, parse(F.col(wkt_col)))


def geojson_to_wkb(
    df: DataFrame, json_col: str, out_col: str = "geometry"
) -> DataFrame:
    """Parse a GeoJSON-geometry string column (``{"type": ...,
    "coordinates": ...}``) into WKB.  Feature objects are unwrapped."""

    @F.pandas_udf("binary")
    def parse(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            d = json.loads(v) if isinstance(v, str) else v
            if d.get("type") == "Feature":
                d = d["geometry"]
            if d is None:  # RFC 7946 allows Feature.geometry = null
                return None
            return wkb.parse_geojson(d)

        return s.map(one)

    return df.withColumn(out_col, parse(F.col(json_col)))


def wkb_to_wkt(df: DataFrame, geometry_col: str = "geometry", out_col: str = "wkt") -> DataFrame:
    """Render a WKB column as WKT text (writer side, for export)."""

    @F.pandas_udf("string")
    def render(s: pd.Series) -> pd.Series:
        vals = s.tolist()
        ga = wkb.decode(vals)
        return pd.Series(
            [None if vals[i] is None else wkb.to_wkt(ga, i) for i in range(len(vals))]
        )

    return df.withColumn(out_col, render(F.col(geometry_col)))


def _one_to_wkb(obj) -> bytes:
    """One geometry-like object -> WKB bytes (reference to_gdf per-item
    coercion, ``conversion.py:209-268``)."""
    if isinstance(obj, (bytes, bytearray)):
        return bytes(obj)
    if isinstance(obj, str):
        return wkb.parse_wkt(obj)
    if isinstance(obj, dict):
        d = obj.get("geometry") if obj.get("type") == "Feature" else obj
        return wkb.parse_geojson(d)
    if isinstance(obj, (tuple, list)) and len(obj) in (2, 3):
        # a coordinate pair (z dropped, like the engine's 2D model)
        return wkb.encode_point(float(obj[0]), float(obj[1]))
    raise ValueError(f"cannot interpret {type(obj).__name__} as a geometry")


def to_geom_df(
    spark: SparkSession, obj, geometry_col: str = "geometry"
) -> DataFrame:
    """Driver-side convenience mirroring the reference's ``to_gdf``:
    accepts one geometry-like object or an iterable of them and returns
    a Spark DataFrame with a WKB ``geometry`` column (idx = input order).

    Like the reference's docstring says, this is for testing and
    exploring; production tables should carry WKB columns already.
    """
    if isinstance(obj, (str, bytes, bytearray, dict)):
        items = [obj]
    elif isinstance(obj, (tuple, list)) and len(obj) in (2, 3) and all(
        isinstance(v, (int, float)) for v in obj
    ):
        items = [obj]
    else:
        items = list(obj)
    rows = [(i, bytearray(_one_to_wkb(it))) for i, it in enumerate(items)]
    return spark.createDataFrame(rows, f"idx long, {geometry_col} binary")
