"""Map projections: parameterized transverse Mercator (any UTM zone on
GRS80) and spherical Web-Mercator.

The reference accepts any pyproj CRS on every frame
(``geopandas_tools/general.py:28-77`` get_common_crs;
``conversion.py:59-72`` get_utm33/get_lonlat delegate to pyproj).  This
engine carries its own pure-numpy Krüger-series kernel instead (public
formulas — Krüger 1912 as summarized in Karney, "Transverse Mercator
with an accuracy of a few nanometers", J. Geodesy 2011; series truncated
at n^4, which keeps every UTM-extent error below ~0.2 mm), parameterized
by central meridian so one kernel serves UTM zones 32/33/34/35 (EPSG
25832-25835 — all of Norway) and any other zone.  EPSG:3857
(spherical Web-Mercator, the web-tile CRS) is closed-form.

Vectorized: arrays in, arrays out — the Spark surface wraps these in
Arrow-batched pandas UDFs, never per-row Python.  ``tm_forward_sql``
emits a DuckDB mirror of the forward series (hyperbolics via exp/ln —
the sandbox DuckDB has none) so reprojections are oracle-checkable.
"""

from __future__ import annotations

import numpy as np

# GRS80 (the ETRS89 / EPSG:258xx ellipsoid)
_A = 6378137.0
_F = 1.0 / 298.257222101
_K0 = 0.9996
_E0 = 500_000.0

_N = _F / (2.0 - _F)
_N2, _N3, _N4 = _N * _N, _N**3, _N**4
# rectifying radius
_AR = _A / (1 + _N) * (1 + _N2 / 4 + _N4 / 64)
_E2 = _F * (2 - _F)
_E = np.sqrt(_E2)

# Krüger alpha (forward) / beta (inverse) / delta (conformal->geographic)
_ALPHA = (
    _N / 2 - 2 * _N2 / 3 + 5 * _N3 / 16 + 41 * _N4 / 180,
    13 * _N2 / 48 - 3 * _N3 / 5 + 557 * _N4 / 1440,
    61 * _N3 / 240 - 103 * _N4 / 140,
    49561 * _N4 / 161280,
)
_BETA = (
    _N / 2 - 2 * _N2 / 3 + 37 * _N3 / 96 - _N4 / 360,
    _N2 / 48 + _N3 / 15 - 437 * _N4 / 1440,
    17 * _N3 / 480 - 37 * _N4 / 840,
    4397 * _N4 / 161280,
)
_DELTA = (
    2 * _N - 2 * _N2 / 3 - 2 * _N3 + 116 * _N4 / 45,
    7 * _N2 / 3 - 8 * _N3 / 5 - 227 * _N4 / 45,
    56 * _N3 / 15 - 136 * _N4 / 35,
    4279 * _N4 / 630,
)


def utm_zone_lon0(zone: int) -> float:
    """Central meridian of a UTM zone (degrees east)."""
    if not 1 <= int(zone) <= 60:
        raise ValueError(f"UTM zone must be 1..60, got {zone}")
    return 6.0 * int(zone) - 183.0


def lonlat_to_tm(lon, lat, lon0: float):
    """(lon°, lat°) -> transverse-Mercator (easting, northing) about the
    central meridian ``lon0``, GRS80, k0=0.9996, 500 km false easting."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    lam = np.radians(lon - lon0)

    # conformal latitude
    s = np.sin(phi)
    t = np.sinh(
        np.arctanh(s) - (2 * np.sqrt(_N) / (1 + _N)) * np.arctanh((2 * np.sqrt(_N) / (1 + _N)) * s)
    )
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))

    x, y = xi.copy(), eta.copy()
    for j, a in enumerate(_ALPHA, start=1):
        x += a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        y += a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    return _E0 + _K0 * _AR * y, _K0 * _AR * x


def tm_to_lonlat(e, n, lon0: float):
    """Transverse-Mercator (easting, northing) about ``lon0`` ->
    (lon°, lat°), vectorized."""
    e = np.asarray(e, dtype=np.float64)
    n = np.asarray(n, dtype=np.float64)
    xi = n / (_K0 * _AR)
    eta = (e - _E0) / (_K0 * _AR)

    xp, yp = xi.copy(), eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xp -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        yp -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)

    chi = np.arcsin(np.sin(xp) / np.cosh(yp))
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(yp), np.cos(xp))
    return lon0 + np.degrees(lam), np.degrees(phi)


def lonlat_to_utm(lon, lat, zone: int):
    """(lon°, lat°) -> (easting, northing) in ETRS89 / UTM ``zone`` N."""
    return lonlat_to_tm(lon, lat, utm_zone_lon0(zone))


def utm_to_lonlat(e, n, zone: int):
    """(easting, northing) in ETRS89 / UTM ``zone`` N -> (lon°, lat°)."""
    return tm_to_lonlat(e, n, utm_zone_lon0(zone))


# zone-33 wrappers (the reference's native CRS, EPSG:25833) — kept as
# named entry points because the whole engine defaults to them.
_LON0 = utm_zone_lon0(33)


def lonlat_to_utm33(lon, lat):
    """(lon°, lat°) -> (easting, northing) in EPSG:25833, vectorized."""
    return lonlat_to_tm(lon, lat, _LON0)


def utm33_to_lonlat(e, n):
    """(easting, northing) EPSG:25833 -> (lon°, lat°), vectorized."""
    return tm_to_lonlat(e, n, _LON0)


# ------------------------------------------------------- Web-Mercator
# EPSG:3857: spherical Mercator on the WGS84 major axis (the standard
# web-tile CRS).  Closed-form; |lat| must stay below ~85.051°.
_R_MERC = 6378137.0


def lonlat_to_webmercator(lon, lat):
    """(lon°, lat°) -> EPSG:3857 (x, y) metres, vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = _R_MERC * np.radians(lon)
    y = _R_MERC * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_lonlat(x, y):
    """EPSG:3857 (x, y) -> (lon°, lat°), vectorized."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / _R_MERC)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / _R_MERC)) - np.pi / 2.0)
    return lon, lat


# ------------------------------------------------- DuckDB SQL mirrors
# The sandbox DuckDB has no sinh/cosh/atanh/asinh; express them via
# exp/ln.  The mirrors track the numpy kernels to a few ulp — callers
# round to integer centimetres, far above the drift and far below any
# wrong-meridian error (~100 km).


def _sql_sinh(x: str) -> str:
    return f"((exp({x}) - exp(-({x}))) / 2)"


def _sql_cosh(x: str) -> str:
    return f"((exp({x}) + exp(-({x}))) / 2)"


def _sql_atanh(x: str) -> str:
    return f"(0.5 * ln((1 + ({x})) / (1 - ({x}))))"


def _sql_asinh(x: str) -> str:
    return f"ln(({x}) + sqrt(({x})*({x}) + 1))"


def tm_forward_sql(lon: str, lat: str, lon0: float) -> tuple[str, str]:
    """(easting_sql, northing_sql) mirroring :func:`lonlat_to_tm` about
    ``lon0`` — same series, same constants, hyperbolics via exp/ln."""
    phi = f"radians({lat})"
    lam = f"radians(({lon}) - {lon0!r})"
    s = f"sin({phi})"
    c = 2 * np.sqrt(_N) / (1 + _N)
    t = _sql_sinh(f"{_sql_atanh(s)} - {c!r} * {_sql_atanh(f'{c!r} * {s}')}")
    xi = f"atan2({t}, cos({lam}))"
    eta = _sql_asinh(f"sin({lam}) / sqrt(({t})*({t}) + cos({lam})*cos({lam}))")
    x_terms = [xi]
    y_terms = [eta]
    for j, a in enumerate(_ALPHA, start=1):
        x_terms.append(f"{a!r} * sin(2*{j}*({xi})) * {_sql_cosh(f'2*{j}*({eta})')}")
        y_terms.append(f"{a!r} * cos(2*{j}*({xi})) * {_sql_sinh(f'2*{j}*({eta})')}")
    x = " + ".join(x_terms)
    y = " + ".join(y_terms)
    return f"({_E0!r} + {_K0 * _AR!r} * ({y}))", f"({_K0 * _AR!r} * ({x}))"


def webmercator_forward_sql(lon: str, lat: str) -> tuple[str, str]:
    """(x_sql, y_sql) mirroring :func:`lonlat_to_webmercator`."""
    return (
        f"({_R_MERC!r} * radians({lon}))",
        f"({_R_MERC!r} * ln(tan({np.pi / 4.0!r} + radians({lat}) / 2)))",
    )


# ------------------------------------------- Lambert azimuthal equal-area
# ETRS89-LAEA (EPSG:3035) — the pan-European statistical grid CRS the
# reference reaches through pyproj (general.py:28-77 accepts any CRS);
# this closes the last projected-CRS family a European-grid user needs.
# Ellipsoidal LAEA per Snyder, "Map Projections — A Working Manual",
# USGS PP 1395, pp. 187-190 (eqs. 3-11..3-12, 24-2..24-27): authalic
# latitude beta, radius Rq = a*sqrt(qp/2), oblique-aspect B/D scaling.
_LAEA_LAT0, _LAEA_LON0 = 52.0, 10.0
_LAEA_X0, _LAEA_Y0 = 4_321_000.0, 3_210_000.0


def _authalic_q(sinphi):
    """Snyder eq. 3-12."""
    es = _E * sinphi
    return (1.0 - _E2) * (
        sinphi / (1.0 - _E2 * sinphi * sinphi)
        - (1.0 / (2.0 * _E)) * np.log((1.0 - es) / (1.0 + es))
    )


_QP = _authalic_q(1.0)  # q at the pole
_RQ = _A * np.sqrt(_QP / 2.0)


def _laea_consts(lat0: float):
    phi1 = np.radians(lat0)
    s1 = np.sin(phi1)
    beta1 = np.arcsin(_authalic_q(s1) / _QP)
    m1 = np.cos(phi1) / np.sqrt(1.0 - _E2 * s1 * s1)
    d = _A * m1 / (_RQ * np.cos(beta1))
    return beta1, d


def lonlat_to_laea(
    lon,
    lat,
    lat0: float = _LAEA_LAT0,
    lon0: float = _LAEA_LON0,
    x0: float = _LAEA_X0,
    y0: float = _LAEA_Y0,
):
    """(lon°, lat°) -> LAEA (easting, northing), vectorized (Snyder
    24-2..24-24; defaults are EPSG:3035)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    beta1, d = _laea_consts(lat0)
    lam = np.radians(lon - lon0)
    beta = np.arcsin(np.clip(_authalic_q(np.sin(np.radians(lat))) / _QP, -1.0, 1.0))
    b = _RQ * np.sqrt(
        2.0
        / (
            1.0
            + np.sin(beta1) * np.sin(beta)
            + np.cos(beta1) * np.cos(beta) * np.cos(lam)
        )
    )
    x = x0 + b * d * np.cos(beta) * np.sin(lam)
    y = y0 + (b / d) * (
        np.cos(beta1) * np.sin(beta) - np.sin(beta1) * np.cos(beta) * np.cos(lam)
    )
    return x, y


def laea_to_lonlat(
    e,
    n,
    lat0: float = _LAEA_LAT0,
    lon0: float = _LAEA_LON0,
    x0: float = _LAEA_X0,
    y0: float = _LAEA_Y0,
):
    """LAEA (easting, northing) -> (lon°, lat°), vectorized (Snyder
    24-26..24-27 + the 3-16 authalic-to-geodetic iteration)."""
    e = np.asarray(e, dtype=np.float64)
    n = np.asarray(n, dtype=np.float64)
    beta1, d = _laea_consts(lat0)
    xp = (e - x0) / d
    yp = (n - y0) * d
    rho = np.sqrt(xp * xp + yp * yp)
    with np.errstate(invalid="ignore", divide="ignore"):
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * _RQ), -1.0, 1.0))
        q = _QP * (
            np.cos(ce) * np.sin(beta1)
            + yp * np.sin(ce) * np.cos(beta1) / np.where(rho == 0.0, 1.0, rho)
        )
        lam = np.arctan2(
            xp * np.sin(ce),
            rho * np.cos(beta1) * np.cos(ce) - yp * np.sin(beta1) * np.sin(ce),
        )
    q = np.where(rho == 0.0, _QP * np.sin(beta1), q)
    lam = np.where(rho == 0.0, 0.0, lam)
    # Snyder 3-16: iterate geodetic latitude from authalic q
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(6):
        s = np.sin(phi)
        es = _E * s
        one = 1.0 - _E2 * s * s
        phi = phi + (one * one / (2.0 * np.cos(phi))) * (
            q / (1.0 - _E2)
            - s / one
            + (1.0 / (2.0 * _E)) * np.log((1.0 - es) / (1.0 + es))
        )
    return lon0 + np.degrees(lam), np.degrees(phi)


def laea_forward_sql(
    lon: str,
    lat: str,
    lat0: float = _LAEA_LAT0,
    lon0: float = _LAEA_LON0,
    x0: float = _LAEA_X0,
    y0: float = _LAEA_Y0,
) -> tuple[str, str]:
    """(easting_sql, northing_sql) DuckDB mirror of
    :func:`lonlat_to_laea` — same Snyder formulation, scalar constants
    precomputed in numpy and emitted as literals."""
    beta1, d = _laea_consts(lat0)
    sb1, cb1 = float(np.sin(beta1)), float(np.cos(beta1))
    lam = f"radians(({lon}) - {lon0!r})"
    s = f"sin(radians({lat}))"
    q = (
        f"({1.0 - _E2!r} * ({s} / (1 - {_E2!r} * {s} * {s})"
        f" - {1.0 / (2.0 * _E)!r} *"
        f" ln((1 - {_E!r} * {s}) / (1 + {_E!r} * {s}))))"
    )
    beta = f"asin(({q}) / {_QP!r})"
    b = (
        f"({_RQ!r} * sqrt(2 / (1 + {sb1!r} * sin({beta})"
        f" + {cb1!r} * cos({beta}) * cos({lam}))))"
    )
    x = f"({x0!r} + {b} * {d!r} * cos({beta}) * sin({lam}))"
    y = (
        f"({y0!r} + ({b} / {d!r}) * ({cb1!r} * sin({beta})"
        f" - {sb1!r} * cos({beta}) * cos({lam})))"
    )
    return x, y
