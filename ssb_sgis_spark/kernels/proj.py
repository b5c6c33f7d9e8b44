"""Transverse-Mercator projection for UTM zone 33 (the reference's
native CRS: EPSG:25833, ETRS89 / UTM 33N — ``conversion.py``'s
``get_utm33`` / ``get_lonlat``).

Pure-numpy Krüger series on the GRS80 ellipsoid (public formulas —
Krüger 1912 as summarized in Karney, "Transverse Mercator with an
accuracy of a few nanometers", J. Geodesy 2011; series truncated at
n^4, which keeps every UTM-extent error below ~0.2 mm).  Vectorized:
arrays in, arrays out — the Spark surface wraps these in an
Arrow-batched pandas UDF, never per-row Python.
"""

from __future__ import annotations

import numpy as np

# GRS80 (EPSG:25833's ellipsoid)
_A = 6378137.0
_F = 1.0 / 298.257222101
_K0 = 0.9996
_E0 = 500_000.0
_LON0 = 15.0  # zone 33 central meridian

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


def lonlat_to_utm33(lon, lat):
    """(lon°, lat°) -> (easting, northing) in EPSG:25833, vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    lam = np.radians(lon - _LON0)

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


def utm33_to_lonlat(e, n):
    """(easting, northing) EPSG:25833 -> (lon°, lat°), vectorized."""
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
    return _LON0 + np.degrees(lam), np.degrees(phi)
