"""Boolean kernel ground-truth tests (pure numpy — no Spark).

Mirrors the reference's overlay test strategy (area equality to tolerance,
``tests/test_overlay.py:80-88``) with closed-form expected areas on boxes
plus rasterized ground truth on random inputs.
"""

import numpy as np
import pytest

from ssb_sgis_spark.kernels.boolean import (
    difference,
    intersection,
    overlay_parts,
    polygon_area,
    ring_signed_area,
    symmetric_difference,
    union_all,
)


def box(x0, y0, x1, y1, ccw=True):
    r = np.array(
        [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], dtype=np.float64
    )
    if not ccw:
        r = r[::-1]
    return [r]  # one ring


def mp(*polys):
    return list(polys)  # multipolygon parts form


def test_box_intersection_area():
    a = mp(box(0, 0, 10, 10))
    b = mp(box(5, 5, 15, 15))
    out = intersection(a, b)
    assert polygon_area(out) == pytest.approx(25.0, abs=1e-9)
    assert len(out) == 1


def test_box_union_area():
    a = mp(box(0, 0, 10, 10))
    b = mp(box(5, 5, 15, 15))
    out = overlay_parts([a], [b], "union")
    assert polygon_area(out) == pytest.approx(175.0, abs=1e-9)


def test_box_difference_and_symdiff():
    a = mp(box(0, 0, 10, 10))
    b = mp(box(5, 5, 15, 15))
    assert polygon_area(difference(a, [b])) == pytest.approx(75.0, abs=1e-9)
    assert polygon_area(symmetric_difference(a, b)) == pytest.approx(150.0, abs=1e-9)


def test_disjoint():
    a = mp(box(0, 0, 1, 1))
    b = mp(box(5, 5, 6, 6))
    assert intersection(a, b) == []
    u = overlay_parts([a], [b], "union")
    assert len(u) == 2
    assert polygon_area(u) == pytest.approx(2.0, abs=1e-12)


def test_contained_difference_makes_hole():
    a = mp(box(0, 0, 10, 10))
    b = mp(box(4, 4, 6, 6))
    out = difference(a, [b])
    assert polygon_area(out) == pytest.approx(96.0, abs=1e-9)
    # one part, two rings (exterior + hole)
    assert len(out) == 1
    assert len(out[0]) == 2


def test_shared_edge_union_dissolves_border():
    """Adjacent tessellation cells: union must drop the shared border."""
    a = mp(box(0, 0, 5, 10))
    b = mp(box(5, 0, 10, 10))
    out = overlay_parts([a], [b], "union")
    assert polygon_area(out) == pytest.approx(100.0, abs=1e-9)
    assert len(out) == 1
    assert len(out[0]) == 1  # no hole, no sliver
    # ring is the outer rectangle: 4 distinct corners after snap-dedupe
    ring = out[0][0]
    assert ring_signed_area(ring) == pytest.approx(100.0, abs=1e-9)


def test_shared_edge_intersection_empty():
    a = mp(box(0, 0, 5, 10))
    b = mp(box(5, 0, 10, 10))
    out = intersection(a, b)
    assert polygon_area(out) == pytest.approx(0.0, abs=1e-9)


def test_hole_polygon_intersection():
    donut = mp([box(0, 0, 10, 10)[0], box(3, 3, 7, 7, ccw=False)[0]])
    probe = mp(box(2, 2, 8, 8))
    out = intersection(donut, probe)
    # 6x6 probe minus 4x4 hole
    assert polygon_area(out) == pytest.approx(36.0 - 16.0, abs=1e-9)


def test_union_of_many_boxes_matches_raster():
    rng = np.random.RandomState(7)
    polys = []
    for _ in range(12):
        x0, y0 = rng.rand(2) * 80
        w, h = 5 + rng.rand(2) * 25
        polys.append(mp(box(x0, y0, x0 + w, y0 + h)))
    out = union_all(polys)
    # rasterized ground truth
    g = np.linspace(0.03, 119.97, 2000)
    xs, ys = np.meshgrid(g, g, indexing="ij")
    covered = np.zeros(xs.shape, dtype=bool)
    for p in polys:
        r = p[0][0]
        covered |= (
            (xs >= r[:, 0].min())
            & (xs <= r[:, 0].max())
            & (ys >= r[:, 1].min())
            & (ys <= r[:, 1].max())
        )
    truth = covered.mean() * 120.0 * 120.0
    assert polygon_area(out) == pytest.approx(truth, rel=5e-3)


def test_triangle_intersection():
    t1 = mp([np.array([(0, 0), (10, 0), (5, 10), (0, 0)], dtype=float)])
    t2 = mp([np.array([(0, 6), (10, 6), (5, -4), (0, 6)], dtype=float)])
    out = intersection(t1, t2)
    # rasterized truth
    g = np.linspace(-4.0, 10.0, 2500)
    xs, ys = np.meshgrid(g, g, indexing="ij")

    def in_tri(p, tri):
        a, b, c = tri[:3]
        s1 = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        s2 = (c[0] - b[0]) * (p[1] - b[1]) - (c[1] - b[1]) * (p[0] - b[0])
        s3 = (a[0] - c[0]) * (p[1] - c[1]) - (a[1] - c[1]) * (p[0] - c[0])
        return ((s1 >= 0) & (s2 >= 0) & (s3 >= 0)) | ((s1 <= 0) & (s2 <= 0) & (s3 <= 0))

    m1 = in_tri((xs, ys), t1[0][0])
    m2 = in_tri((xs, ys), t2[0][0])
    truth = (m1 & m2).mean() * 14.0 * 14.0
    assert polygon_area(out) == pytest.approx(truth, rel=5e-3)


def test_identity_and_self_union():
    a = mp(box(0, 0, 10, 10))
    assert polygon_area(union_all([a])) == pytest.approx(100.0, abs=1e-9)
    assert polygon_area(intersection(a, a)) == pytest.approx(100.0, abs=1e-9)
    assert difference(a, [a]) == []


def test_difference_against_group_union():
    """difference subtracts the UNION of the right group in one pass
    (reference overlay.py:338-345 groupby-left union-of-right)."""
    a = mp(box(0, 0, 10, 10))
    b1 = mp(box(-1, -1, 5, 11))
    b2 = mp(box(4, -1, 11, 11))
    out = difference(a, [b1, b2])
    assert out == []
