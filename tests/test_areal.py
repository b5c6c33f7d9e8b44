"""Areal interpolation Morton -> SSB grid (operators/areal.py)."""

import pytest

from ssb_sgis_spark.cells import DOMAIN_X0, DOMAIN_Y0, cell_size
from ssb_sgis_spark.operators.areal import areal_interpolate_to_ssb


def test_areal_mass_conservation(spark):
    """Total interpolated mass equals total points x 1e6 minus bounded
    truncation (each of the <=9 terms per source cell floors away less
    than one micro-page)."""
    n = 500
    pts = spark.range(n).selectExpr(
        f"200000.0 + (id * 317 % 160000) AS x",
        f"6560000.0 + (id * 711 % 160000) AS y",
    )
    out = areal_interpolate_to_ssb(pts, res=13)
    total = out.agg({"pages_micro": "sum"}).collect()[0][0]
    n_cells = 500  # upper bound: every point in its own cell
    assert n * 1_000_000 - 9 * n_cells <= total <= n * 1_000_000


def test_areal_exact_split_single_cell(spark):
    """One res-13 cell (1024 m) holding 4 points spans SSB columns/rows
    in a way we can compute by hand when it starts ON a gridline: cell
    [0, 1024) against grid [0, 1000) + [1000, 2000) splits 1000:24."""
    # find a cell whose shifted origin is a multiple of 128000 (lcm of
    # 1024 and 1000 is 128000): sx0 = 0 -> ix = 0 is outside the page
    # extent but the operator is pure arithmetic, so use it directly
    x0, y0 = DOMAIN_X0, DOMAIN_Y0  # shifted (0, 0) -> cell + grid aligned
    pts = spark.createDataFrame(
        [(x0 + 10.0, y0 + 10.0)] * 4, "x double, y double"
    )
    rows = {r.SSBID: r.pages_micro for r in areal_interpolate_to_ssb(pts, res=13).collect()}
    cs = int(cell_size(13))
    assert cs == 1024
    # weights: (1000*1000, 1000*24, 24*1000, 24*24) / 1024^2, x4 points
    def w(a, b):
        return 4 * a * b * 1_000_000 // (1024 * 1024)

    got = sorted(rows.values(), reverse=True)
    assert got == sorted(
        [w(1000, 1000), w(1000, 24), w(24, 1000), w(24, 24)], reverse=True
    )
    assert len(rows) == 4


def test_areal_rejects_non_integer_cells(spark):
    pts = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
    with pytest.raises(ValueError, match="non-integer"):
        areal_interpolate_to_ssb(pts, res=24)
