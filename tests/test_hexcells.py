"""Hex cell index: nearest-center semantics, round-trips, Spark parity."""

import numpy as np
from pyspark.sql import functions as F

from ssb_sgis_spark.hexcells import (
    AXIAL_NEIGHBORS,
    hex_bin,
    hex_center_np,
    hex_density,
    hex_neighbors_np,
    hex_qr_np,
    hex_smooth,
)
from tests.conftest import spark  # noqa: F401

SIZE = 250.0
RNG = np.random.default_rng(7)


def _points(n=4000, lo=-5000.0, hi=5000.0):
    return RNG.uniform(lo, hi, n), RNG.uniform(lo, hi, n)


def test_hex_assignment_is_nearest_center():
    """Cube rounding's contract: the assigned hex's center is at least as
    close as EVERY hex in the surrounding 5x5 axial block (which contains
    the true nearest center for any point)."""
    x, y = _points()
    q, r = hex_qr_np(x, y, SIZE)
    cx, cy = hex_center_np(q, r, SIZE)
    d_own = (x - cx) ** 2 + (y - cy) ** 2
    for dq in range(-2, 3):
        for dr in range(-2, 3):
            ox, oy = hex_center_np(q + dq, r + dr, SIZE)
            d_other = (x - ox) ** 2 + (y - oy) ** 2
            assert (d_own <= d_other + 1e-6).all(), (dq, dr)


def test_center_round_trips_to_own_cell():
    qs, rs = np.meshgrid(np.arange(-20, 21), np.arange(-20, 21))
    qs, rs = qs.ravel(), rs.ravel()
    cx, cy = hex_center_np(qs, rs, SIZE)
    q2, r2 = hex_qr_np(cx, cy, SIZE)
    assert (q2 == qs).all() and (r2 == rs).all()


def test_neighbor_centers_equidistant():
    """All 6 neighbors are at the same center distance sqrt(3)*size —
    the property square grids lack (H3's selling point)."""
    nq, nr = hex_neighbors_np(np.array([3]), np.array([-2]))
    assert len(nq) == 6 == len(set(zip(nq.tolist(), nr.tolist())))
    cx0, cy0 = hex_center_np(np.array([3]), np.array([-2]), SIZE)
    nx, ny = hex_center_np(nq, nr, SIZE)
    d = np.hypot(nx - cx0, ny - cy0)
    np.testing.assert_allclose(d, np.sqrt(3.0) * SIZE, rtol=1e-12)
    assert len(AXIAL_NEIGHBORS) == 6


def test_spark_matches_numpy_and_plan_is_map_only(spark):
    x, y = _points(2000)
    pdf = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(x, y))],
        "uid long, x double, y double",
    )
    out = hex_bin(pdf, SIZE).orderBy("uid").toPandas()
    q, r = hex_qr_np(x, y, SIZE)
    assert (out["hex_q"].to_numpy() == q).all()
    assert (out["hex_r"].to_numpy() == r).all()

    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hex_bin(pdf, SIZE).explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p  # map-only projection
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_hex_density_counts(spark):
    x, y = _points(3000)
    pdf = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    dens = hex_density(pdf, SIZE).toPandas()
    assert int(dens["n"].sum()) == 3000
    q, r = hex_qr_np(x, y, SIZE)
    import collections

    cnt = collections.Counter(zip(q.tolist(), r.tolist()))
    got = {(int(a), int(b)): int(n) for a, b, n in dens.itertuples(index=False)}
    assert got == dict(cnt)


def test_hex_smooth_is_7_cell_disk_sum(spark):
    """hex_smooth(hex) == sum of hex_density over {hex} + its 6 neighbors
    (zero-count hexes contribute nothing but can still RECEIVE a row when
    a neighbor is occupied — scatter covers the occupied set's halo)."""
    x, y = _points(3000)
    pdf = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    q, r = hex_qr_np(x, y, SIZE)
    import collections

    cnt = collections.Counter(zip(q.tolist(), r.tolist()))
    want = collections.Counter()
    for (cq, cr), n in cnt.items():
        for dq, dr in ((0, 0), *AXIAL_NEIGHBORS):
            want[(cq + dq, cr + dr)] += n

    out = hex_smooth(pdf, SIZE).toPandas()
    got = {(int(a), int(b)): int(n) for a, b, n in out.itertuples(index=False)}
    assert got == dict(want)
    # total mass: every page counted exactly 7 times (once per disk cell)
    assert int(out["n_disk"].sum()) == 7 * 3000

    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hex_smooth(pdf, SIZE).explain("formatted")
    p = buf.getvalue()
    assert "Join" not in p  # scatter-explode, never a join
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
