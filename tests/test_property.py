"""Property-based tests (hypothesis) for the numeric kernels.

The reference leans on GEOS/pyproj for geometry correctness; this engine
carries its own kernels, so the correctness argument needs to hold over
*arbitrary* inputs, not just the fixtures.  These properties are the
kernel invariants the operators rely on:

* WKB codec: encode∘decode is the identity on bytes (the byte-stability
  contract every oracle compare depends on).
* Boolean overlay: area conservation A = (A∩B) + (A∖B), commutativity of
  ∩, and containment bounds — the algebra `overlay()` assumes.
* Morton cells: point-in-cell containment and parent monotonicity — what
  the cover join's correctness rests on.
* UTM33 projection: bijectivity over the zone extent.

All pure numpy (no Spark session), so the whole module runs in seconds.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ssb_sgis_spark import cells
from ssb_sgis_spark.kernels import boolean, proj, wkb

# ---------------------------------------------------------------- strategies

# grid-quantized coordinates keep polygons well clear of the boolean
# kernel's SNAP quantum (1e-6), like real data at any sane CRS scale
coord = st.integers(min_value=-1000, max_value=1000).map(lambda v: v / 4.0)


@st.composite
def boxes(draw):
    x0 = draw(coord)
    y0 = draw(coord)
    w = draw(st.integers(min_value=1, max_value=400)) / 4.0
    h = draw(st.integers(min_value=1, max_value=400)) / 4.0
    return (x0, y0, x0 + w, y0 + h)


def box_parts(b):
    x0, y0, x1, y1 = b
    ring = np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], float)
    return [[ring]]


@st.composite
def point_lists(draw):
    n = draw(st.integers(min_value=1, max_value=20))
    xs = draw(st.lists(coord, min_size=n, max_size=n))
    ys = draw(st.lists(coord, min_size=n, max_size=n))
    return np.column_stack([xs, ys])


# ------------------------------------------------------------------ wkb codec


@given(point_lists())
@settings(max_examples=200, deadline=None)
def test_wkb_multipoint_roundtrip(pts):
    buf = wkb.encode_multipoint(pts)
    ga = wkb.decode([buf])
    assert np.array_equal(ga.coords, pts)
    re = wkb.encode(ga)[0]
    if len(pts) >= 2:
        assert re == buf
    else:
        # 1-point MULTIPOINT canonicalizes to POINT; coords must survive
        ga2 = wkb.decode([re])
        assert np.array_equal(ga2.coords, pts)


@given(point_lists())
@settings(max_examples=200, deadline=None)
def test_wkb_linestring_roundtrip(pts):
    if len(pts) < 2:
        pts = np.vstack([pts, pts + 1.0])
    buf = wkb.encode_linestring(pts)
    ga = wkb.decode([buf])
    assert np.array_equal(ga.coords, pts)
    assert wkb.encode(ga)[0] == buf


@given(boxes())
@settings(max_examples=200, deadline=None)
def test_wkb_polygon_roundtrip(b):
    buf = wkb.encode_polygon(box_parts(b)[0])
    ga = wkb.decode([buf])
    assert wkb.encode(ga)[0] == buf
    # WKT text round trip is value-stable too
    buf2 = wkb.parse_wkt(wkb.render_wkt(ga, 0) if hasattr(wkb, "render_wkt") else _wkt(ga))
    assert wkb.decode([buf2]).coords == pytest.approx(ga.coords)


def _wkt(ga):
    # helper for whichever render name the codec exposes
    for name in ("render_wkt", "to_wkt", "wkt_one"):
        fn = getattr(wkb, name, None)
        if fn is not None:
            return fn(ga, 0)
    raise AttributeError("no wkt renderer found")


# ------------------------------------------------------------- boolean algebra


def area(parts):
    return boolean.polygon_area(parts)


@given(boxes(), boxes())
@settings(max_examples=150, deadline=None)
def test_overlay_area_conservation(a, b):
    """area(A) == area(A∩B) + area(A∖B) for arbitrary boxes (incl. the
    degenerate touch/disjoint/contained configurations)."""
    pa, pb = box_parts(a), box_parts(b)
    inter = boolean.overlay_parts([pa], [pb], "intersection")
    diff = boolean.overlay_parts([pa], [pb], "difference")
    total = area(inter) + area(diff)
    assert total == pytest.approx(area(pa), abs=1e-6)


@given(boxes(), boxes())
@settings(max_examples=150, deadline=None)
def test_overlay_intersection_commutes_and_bounds(a, b):
    pa, pb = box_parts(a), box_parts(b)
    ab = area(boolean.overlay_parts([pa], [pb], "intersection"))
    ba = area(boolean.overlay_parts([pb], [pa], "intersection"))
    assert ab == pytest.approx(ba, abs=1e-6)
    assert ab <= min(area(pa), area(pb)) + 1e-6
    # closed form for boxes
    x0, y0, x1, y1 = a
    u0, v0, u1, v1 = b
    w = max(0.0, min(x1, u1) - max(x0, u0))
    h = max(0.0, min(y1, v1) - max(y0, v0))
    assert ab == pytest.approx(w * h, abs=1e-6)


@given(boxes(), boxes())
@settings(max_examples=150, deadline=None)
def test_overlay_symdiff_identity(a, b):
    """area(A xor B) == area(A) + area(B) - 2*area(A∩B)."""
    pa, pb = box_parts(a), box_parts(b)
    sym = area(boolean.overlay_parts([pa], [pb], "symdiff"))
    inter = area(boolean.overlay_parts([pa], [pb], "intersection"))
    assert sym == pytest.approx(area(pa) + area(pb) - 2 * inter, abs=1e-6)


@given(boxes(), boxes())
@settings(max_examples=100, deadline=None)
def test_union_area_inclusion_exclusion(a, b):
    pa, pb = box_parts(a), box_parts(b)
    uni = area(boolean.overlay_parts([pa], [pb], "union"))
    inter = area(boolean.overlay_parts([pa], [pb], "intersection"))
    assert uni == pytest.approx(area(pa) + area(pb) - inter, abs=1e-6)


# ----------------------------------------------------------------- morton cells

domain_x = st.floats(
    min_value=cells.DOMAIN_X0,
    max_value=cells.DOMAIN_X0 + cells.DOMAIN_SIZE - 1e-6,
    allow_nan=False,
)
domain_y = st.floats(
    min_value=cells.DOMAIN_Y0,
    max_value=cells.DOMAIN_Y0 + cells.DOMAIN_SIZE - 1e-6,
    allow_nan=False,
)


@given(domain_x, domain_y, st.integers(min_value=1, max_value=16))
@settings(max_examples=200, deadline=None)
def test_cell_parent_consistency(x, y, res):
    """cell at res-1 == parent(cell at res): the cover join's refinement
    hierarchy never misroutes a point."""
    xs, ys = np.array([x]), np.array([y])
    fine = cells.cell_of_xy_np(xs, ys, res)
    coarse = cells.cell_of_xy_np(xs, ys, res - 1)
    assert cells.cell_parent(fine, 1)[0] == coarse[0]


@given(domain_x, domain_y, st.integers(min_value=1, max_value=16))
@settings(max_examples=200, deadline=None)
def test_cell_morton_order_matches_ixy(x, y, res):
    s = cells.cell_size(res)
    ix = int((x - cells.DOMAIN_X0) // s)
    iy = int((y - cells.DOMAIN_Y0) // s)
    got = cells.cell_of_xy_np(np.array([x]), np.array([y]), res)[0]
    assert got == cells.morton_np(np.array([ix]), np.array([iy]))[0]


# ------------------------------------------------------------------ projection


@given(
    st.floats(min_value=4.0, max_value=32.0, allow_nan=False),
    st.floats(min_value=55.0, max_value=72.0, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_proj_roundtrip_everywhere_in_zone(lon, lat):
    e, n = proj.lonlat_to_utm33(np.array([lon]), np.array([lat]))
    lon2, lat2 = proj.utm33_to_lonlat(e, n)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


@given(st.floats(min_value=55.0, max_value=72.0, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_proj_central_meridian_is_scaled_arc(lat):
    """On lon=15 the easting is exactly 500 km and northing is strictly
    increasing in latitude (meridian arc monotonicity)."""
    e, n = proj.lonlat_to_utm33(np.array([15.0, 15.0]), np.array([lat, lat + 0.01]))
    assert e[0] == pytest.approx(500_000.0, abs=1e-6)
    assert n[1] > n[0]


# ------------------------------------------------- simplify / segmentize
from ssb_sgis_spark.kernels.geom import segmentize_ring, simplify_ring


@st.composite
def polylines(draw):
    n = draw(st.integers(min_value=2, max_value=30))
    xs = draw(st.lists(coord, min_size=n, max_size=n))
    ys = draw(st.lists(coord, min_size=n, max_size=n))
    return np.column_stack([xs, ys]).astype(float)


@given(polylines(), st.integers(min_value=1, max_value=100))
@settings(max_examples=60, deadline=None)
def test_segmentize_preserves_shape(line, ml4):
    ml = ml4 / 4.0
    out = segmentize_ring(line, ml)
    # endpoints bit-exact, originals present as a subsequence
    assert (out[0] == line[0]).all() and (out[-1] == line[-1]).all()
    d = np.hypot(np.diff(out[:, 0]), np.diff(out[:, 1]))
    assert (d <= ml + 1e-9).all()
    # total length preserved
    d0 = np.hypot(np.diff(line[:, 0]), np.diff(line[:, 1]))
    assert abs(d.sum() - d0.sum()) < 1e-6 * max(1.0, d0.sum())
    # every original vertex appears in order
    j = 0
    for p in line:
        while j < len(out) and not np.allclose(out[j], p, atol=1e-12):
            j += 1
        assert j < len(out)
    # vertex count is the exact subdivision sum
    nsub = np.maximum(np.ceil(np.where(d0 > 0, d0 / ml, 1)).astype(int), 1)
    assert len(out) == nsub.sum() + 1


def _line_dist(p, a, b):
    """Perpendicular distance of p to the INFINITE line through a-b
    (falls back to point distance when a == b) — the metric D-P prunes
    by, so it is the metric the guarantee holds in."""
    dx, dy = b[0] - a[0], b[1] - a[1]
    nrm2 = dx * dx + dy * dy
    if nrm2 == 0.0:
        return float(np.hypot(p[0] - a[0], p[1] - a[1]))
    return abs(dx * (p[1] - a[1]) - dy * (p[0] - a[0])) / nrm2 ** 0.5


@given(polylines(), st.integers(min_value=0, max_value=40))
@settings(max_examples=60, deadline=None)
def test_simplify_is_subsequence_within_tolerance(line, tol4):
    tol = tol4 / 4.0
    out = simplify_ring(line, tol, closed=False)
    # endpoints kept; output a subsequence of input (recover indices)
    assert (out[0] == line[0]).all() and (out[-1] == line[-1]).all()
    kept_idx = []
    j = 0
    for p in out:
        while j < len(line) and not (line[j] == p).all():
            j += 1
        assert j < len(line)
        kept_idx.append(j)
        j += 1
    # D-P guarantee: every dropped vertex between consecutive kept
    # vertices lies within tol of the infinite line through them
    for s, e in zip(kept_idx[:-1], kept_idx[1:]):
        for m in range(s + 1, e):
            assert _line_dist(line[m], line[s], line[e]) <= tol + 1e-9


@given(
    st.floats(min_value=-10.0, max_value=35.0, allow_nan=False),
    st.floats(min_value=34.0, max_value=72.0, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_laea_roundtrip_everywhere_in_europe(lon, lat):
    """EPSG:3035 bijectivity over the pan-European extent (round 5)."""
    e, n = proj.lonlat_to_laea(np.array([lon]), np.array([lat]))
    lon2, lat2 = proj.laea_to_lonlat(e, n)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9
