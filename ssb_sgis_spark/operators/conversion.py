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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import proj, wkb


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


# ---------------------------------------------------------------------------
# CRS transforms (reference ``conversion.py:59-72`` get_utm33 / get_lonlat,
# ``general.py:28-77`` get_common_crs).
#
# The reference delegates to pyproj; this engine carries its own
# pure-numpy Krueger-series transverse-Mercator kernel parameterized by
# central meridian — see :mod:`..kernels.proj` — so any UTM zone on
# GRS80 is one registry entry.  Registered out of the box: EPSG:4326
# (lon/lat), EPSG:25832-25835 (ETRS89 / UTM 32-35N: all of Norway), and
# EPSG:3857 (Web-Mercator, the web-tile CRS).  Driver-side
# scalars/arrays below mirror the reference call shape;
# ``transform_coords`` / ``project_to_utm33`` / ``project_to_lonlat``
# are the scale path (Arrow-batched pandas UDF over x/y columns).
# ---------------------------------------------------------------------------

# EPSG -> (from_lonlat, to_lonlat); each fn is vectorized arrays->arrays.


def _identity2(a, b):
    return np.asarray(a, np.float64), np.asarray(b, np.float64)


CRS_REGISTRY: dict[int, tuple] = {
    4326: (_identity2, _identity2),
    3857: (proj.lonlat_to_webmercator, proj.webmercator_to_lonlat),
    # ETRS89-LAEA — the pan-European statistical grid (kernels/proj.py
    # Snyder LAEA; forward matches the EPSG Guidance Note 7-2 test
    # point to sub-mm)
    3035: (proj.lonlat_to_laea, proj.laea_to_lonlat),
}
for _zone in (32, 33, 34, 35):
    CRS_REGISTRY[25800 + _zone] = (
        (lambda lon, lat, z=_zone: proj.lonlat_to_utm(lon, lat, z)),
        (lambda e, n, z=_zone: proj.utm_to_lonlat(e, n, z)),
    )


def register_utm_crs(epsg: int, zone: int) -> None:
    """Register another transverse-Mercator CRS (e.g. 32633 for
    WGS84/UTM33 — GRS80 vs WGS84 ellipsoid difference is sub-mm)."""
    CRS_REGISTRY[int(epsg)] = (
        (lambda lon, lat, z=int(zone): proj.lonlat_to_utm(lon, lat, z)),
        (lambda e, n, z=int(zone): proj.utm_to_lonlat(e, n, z)),
    )


def register_laea_crs(
    epsg: int, lat0: float, lon0: float, x0: float, y0: float
) -> None:
    """Register another Lambert-azimuthal-equal-area CRS (the Snyder
    kernel is fully parameterized; 3035 ships pre-registered)."""
    p = (float(lat0), float(lon0), float(x0), float(y0))
    CRS_REGISTRY[int(epsg)] = (
        (lambda lon, lat, _p=p: proj.lonlat_to_laea(lon, lat, *_p)),
        (lambda e, n, _p=p: proj.laea_to_lonlat(e, n, *_p)),
    )


def _crs_fns(crs: int) -> tuple:
    try:
        return CRS_REGISTRY[int(crs)]
    except KeyError:
        raise NotImplementedError(
            f"EPSG:{crs} is not registered; supported: "
            f"{sorted(CRS_REGISTRY)} (use register_utm_crs for other "
            "transverse-Mercator zones, register_laea_crs for other "
            "equal-area grids)"
        ) from None


def get_common_crs(*crs_values, strict: bool = True):
    """The single CRS shared by the inputs (reference ``general.py:28-77``):
    Nones are ignored; conflicting values raise; all-None raises when
    ``strict``.  Accepts ints or objects with a ``crs`` attribute."""
    seen = set()
    for v in crs_values:
        v = getattr(v, "crs", v)
        if v is None:
            continue
        seen.add(int(v))
    if not seen:
        if strict:
            raise ValueError("no CRS found on any input")
        return None
    if len(seen) > 1:
        raise ValueError(f"conflicting CRS on inputs: {sorted(seen)}")
    return seen.pop()


def _maybe_scalar(out_a, out_b, in_a):
    if np.ndim(out_a) == 0 or (np.ndim(in_a) == 0 and np.asarray(out_a).size == 1):
        return (
            float(np.asarray(out_a).reshape(-1)[0]),
            float(np.asarray(out_b).reshape(-1)[0]),
        )
    return out_a, out_b


def get_utm33(lon, lat, crs: int = 25833):
    """lon/lat degrees (EPSG:4326) -> easting/northing in ``crs``
    (default EPSG:25833, the reference's native CRS).

    Mirrors reference ``conversion.py:59`` (scalar in, scalar out;
    arrays also accepted).  Any registered CRS works.
    """
    fwd, _ = _crs_fns(crs)
    e, n = fwd(lon, lat)
    return _maybe_scalar(e, n, lon)


def get_lonlat(x, y, crs: int = 25833):
    """``crs`` easting/northing -> lon/lat degrees (EPSG:4326).

    Mirrors reference ``conversion.py:67``.
    """
    _, inv = _crs_fns(crs)
    lon, lat = inv(x, y)
    return _maybe_scalar(lon, lat, x)


def transform_coords_np(x, y, from_crs: int, to_crs: int):
    """Vectorized reprojection between any two registered CRS, composing
    inverse(from) then forward(to) through lon/lat."""
    if int(from_crs) == int(to_crs):
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    _, inv = _crs_fns(from_crs)
    fwd, _ = _crs_fns(to_crs)
    lon, lat = inv(x, y)
    return fwd(lon, lat)


def transform_coords(
    df: DataFrame,
    from_crs: int,
    to_crs: int,
    x_col: str = "x",
    y_col: str = "y",
    out_x: str | None = None,
    out_y: str | None = None,
) -> DataFrame:
    """Scale path: reproject coordinate columns between any two
    registered CRS with one Arrow-batched numpy kernel per chunk —
    map-only, no shuffle, no per-row Python.  Defaults to overwriting
    the input columns (reference ``to_crs`` semantics)."""
    _crs_fns(from_crs), _crs_fns(to_crs)  # fail fast on the driver

    def fn(x, y):
        return transform_coords_np(x, y, from_crs, to_crs)

    return _project_cols(df, x_col, y_col, out_x or x_col, out_y or y_col, fn)


def _project_cols(df: DataFrame, x_col: str, y_col: str, out_x: str, out_y: str, fn):
    @F.pandas_udf("struct<x: double, y: double>")
    def tx(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        a, b = fn(x.to_numpy(np.float64), y.to_numpy(np.float64))
        return pd.DataFrame({"x": a, "y": b})

    # materialize the struct ONCE from the ORIGINAL columns: chaining
    # withColumn(out_x, s["x"]).withColumn(out_y, s["y"]) would both run
    # the UDF twice and — when out_x == x_col (in-place reprojection) —
    # feed the second call the already-transformed x
    s = tx(F.col(x_col), F.col(y_col))
    return (
        df.withColumn("__tx", s)
        .withColumns({out_x: F.col("__tx.x"), out_y: F.col("__tx.y")})
        .drop("__tx")
    )


def project_to_utm33(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    out_x: str = "x",
    out_y: str = "y",
) -> DataFrame:
    """Scale path for :func:`get_utm33`: project lon/lat columns to
    EPSG:25833 x/y with one Arrow-batched numpy kernel per chunk —
    map-only, no shuffle, no per-row Python."""
    return _project_cols(df, lon_col, lat_col, out_x, out_y, proj.lonlat_to_utm33)


def project_to_lonlat(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    out_lon: str = "lon",
    out_lat: str = "lat",
) -> DataFrame:
    """Scale path for :func:`get_lonlat` (inverse projection, map-only)."""
    return _project_cols(df, x_col, y_col, out_lon, out_lat, proj.utm33_to_lonlat)


def coordinate_array(df, geometry_col: str = "geometry") -> "np.ndarray":
    """2-D ndarray of point coordinates (reference ``conversion.py:75``).

    Accepts a Spark DataFrame with a WKB point column (collected — this
    is the reference's testing/driver convenience, not a scale path) or
    a pandas DataFrame/Series of WKB bytes.  Non-point rows yield
    (nan, nan), matching the reference's non-strict behavior.
    """
    if isinstance(df, DataFrame):
        pdf = df.select(geometry_col).toPandas()
        series = pdf[geometry_col]
    elif isinstance(df, pd.DataFrame):
        series = df[geometry_col]
    else:
        series = pd.Series(df)
    out = np.full((len(series), 2), np.nan)
    for i, buf in enumerate(series):
        if buf is None:
            continue
        arr = wkb.decode([bytes(buf)])
        if arr.types[0] == wkb.T_POINT and len(arr.coords):
            out[i] = arr.coords[0]
    return out
