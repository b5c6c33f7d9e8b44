"""Spatial autocorrelation (operators/spatialstats.py): LISA quadrants
and global Moran's I vs an independent numpy reference + closed-form
semantics (hot blob, checkerboard, uniform)."""

import numpy as np
import pytest

from ssb_sgis_spark.hexcells import AXIAL_NEIGHBORS, hex_center_np
from ssb_sgis_spark.operators.spatialstats import lisa_quadrants, morans_i

SIZE = 100.0


def _points_df(spark, counts: dict[tuple[int, int], int]):
    """Place `count` points at each hex cell's center (centers always
    bin back to their own cell)."""
    rows = []
    uid = 0
    for (q, r), c in counts.items():
        x, y = hex_center_np(np.array([q]), np.array([r]), SIZE)
        for _ in range(c):
            rows.append((uid, float(x[0]), float(y[0])))
            uid += 1
    return spark.createDataFrame(rows, "uid long, x double, y double")


def _reference(counts: dict[tuple[int, int], int]):
    """Independent integer-law reference: z_i = N*n_i - S over occupied
    cells, rook weights on the 6 axial neighbors."""
    cells = sorted(counts)
    N = len(cells)
    S = sum(counts.values())
    z = {c: N * counts[c] - S for c in cells}
    lag, pairs = {}, {}
    for (q, r) in cells:
        nb = [(q + dq, r + dr) for dq, dr in AXIAL_NEIGHBORS]
        occ = [c for c in nb if c in counts]
        lag[(q, r)] = sum(z[c] for c in occ)
        pairs[(q, r)] = len(occ)
    quad = {}
    for c in cells:
        zz, lg, np_ = z[c], lag[c], pairs[c]
        if zz == 0 or np_ == 0 or lg == 0:
            quad[c] = "NS"
        elif zz > 0 and lg > 0:
            quad[c] = "HH"
        elif zz < 0 and lg < 0:
            quad[c] = "LL"
        elif zz > 0 and lg < 0:
            quad[c] = "HL"
        else:
            quad[c] = "LH"
    cross = sum(z[c] * lag[c] for c in cells)
    ssq = sum(z[c] * z[c] for c in cells)
    s0 = sum(pairs.values())
    den = s0 * ssq
    i_micro = (1_000_000 * N * cross) // den if den else 0
    return z, lag, pairs, quad, (N, s0, cross, ssq, i_micro)


def _check(spark, counts):
    df = _points_df(spark, counts)
    got = {
        (r["hex_q"], r["hex_r"]): r
        for r in lisa_quadrants(df, SIZE).collect()
    }
    z, lag, pairs, quad, glob = _reference(counts)
    assert set(got) == set(counts)
    for c in counts:
        assert got[c]["n"] == counts[c]
        assert got[c]["z_num"] == z[c], c
        assert got[c]["lag_num"] == lag[c], c
        assert got[c]["nbr_pairs"] == pairs[c], c
        assert got[c]["quadrant"] == quad[c], c
    row = morans_i(df, SIZE).collect()[0]
    N, s0, cross, ssq, i_micro = glob
    assert row["n_cells"] == N and row["s0_pairs"] == s0
    assert int(row["cross_sum"]) == cross and int(row["ssq_sum"]) == ssq
    assert row["i_micro"] == i_micro
    return quad, i_micro


def test_hot_blob_is_a_high_outlier(spark):
    """One loaded cell ringed by light cells: the center is HL (high in
    a low neighborhood), the ring is LH, and global I is negative."""
    counts = {(0, 0): 20}
    for dq, dr in AXIAL_NEIGHBORS:
        counts[(dq, dr)] = 1
    quad, i_micro = _check(spark, counts)
    assert quad[(0, 0)] == "HL"
    assert all(quad[c] == "LH" for c in counts if c != (0, 0))
    assert i_micro < 0


def test_two_adjacent_plateaus_are_hh_ll_cores(spark):
    """A high strip next to a low strip along the q axis: interior high
    cells are HH, interior low cells LL, and global I is positive."""
    counts = {(q, 0): (9 if q < 4 else 1) for q in range(8)}
    quad, i_micro = _check(spark, counts)
    assert quad[(0, 0)] == "HH" and quad[(1, 0)] == "HH"
    assert quad[(6, 0)] == "LL" and quad[(7, 0)] == "LL"
    assert i_micro > 0


def test_checkerboard_is_negatively_autocorrelated(spark):
    """Alternating high/low along a line → negative I, no HH/LL cells."""
    counts = {(q, 0): (9 if q % 2 == 0 else 1) for q in range(8)}
    quad, i_micro = _check(spark, counts)
    assert i_micro < 0
    assert not any(v in ("HH", "LL") for v in quad.values())


def test_uniform_counts_are_degenerate(spark):
    """All cells equal → every z is 0, all NS, I defined as 0."""
    counts = {(q, r): 3 for q in range(3) for r in range(3)}
    quad, i_micro = _check(spark, counts)
    assert set(quad.values()) == {"NS"}
    assert i_micro == 0


def test_isolated_cells_have_no_pairs(spark):
    """Cells far apart: nbr_pairs = 0 everywhere → NS, s0 = 0 → I = 0."""
    counts = {(0, 0): 5, (10, 10): 1, (-10, 5): 2}
    quad, i_micro = _check(spark, counts)
    assert set(quad.values()) == {"NS"}
    assert i_micro == 0


def test_random_lattice_matches_reference(spark):
    """Property check: a seeded random occupancy/count pattern matches
    the independent numpy reference cell-for-cell."""
    rng = np.random.RandomState(42)
    counts = {}
    for q in range(-3, 4):
        for r in range(-3, 4):
            if rng.rand() < 0.6:
                counts[(q, r)] = int(rng.randint(1, 12))
    _check(spark, counts)
