"""clean_overlay / dissolve / clusters — Spark results vs driver-side
numpy oracle (the reference's golden-parity test style,
``tests/test_overlay.py:61-95``: row count + area sums to tolerance)."""

import numpy as np
import pytest

from ssb_sgis_spark.kernels import wkb
from ssb_sgis_spark.kernels.boolean import overlay_parts, polygon_area, union_all
from ssb_sgis_spark.operators.dissolve import (
    buffdissexp,
    dissexp,
    dissexp_by_cluster,
)
from ssb_sgis_spark.operators.overlay import clean_overlay
from ssb_sgis_spark.operators.clusters import (
    cluster_points_within_distance,
    connected_components,
)


def _box_ring(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], dtype=float)


def _boxes_df(spark, boxes, id_name="bid"):
    rows = [
        (i, bytearray(wkb.encode_polygon([_box_ring(*b)]))) for i, b in enumerate(boxes)
    ]
    return spark.createDataFrame(rows, f"{id_name} long, geometry binary")


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.RandomState(3)
    # coordinates inside the engine's domain (Norway-ish metres)
    ox, oy = 250000.0, 6600000.0

    def rand_boxes(n, seed):
        r = np.random.RandomState(seed)
        out = []
        for _ in range(n):
            x0 = ox + r.rand() * 5000
            y0 = oy + r.rand() * 5000
            out.append((x0, y0, x0 + 300 + r.rand() * 1500, y0 + 300 + r.rand() * 1500))
        return out

    A = rand_boxes(25, 11)
    B = rand_boxes(18, 22)
    return A, B, _boxes_df(spark, A, "aid"), _boxes_df(spark, B, "bid")


def _oracle_pairs(A, B, op):
    """Driver-side numpy oracle: per-pair boolean op results."""
    out = {}
    for i, a in enumerate(A):
        for j, b in enumerate(B):
            parts = overlay_parts(
                [[[_box_ring(*a)]]], [[[_box_ring(*b)]]], op
            )
            if parts:
                out[(i, j)] = polygon_area(parts)
    return out


def test_overlay_intersection(spark, frames):
    A, B, dfa, dfb = frames
    res = clean_overlay(dfa, dfb, "intersection").collect()
    got = {}
    for r in res:
        ga = wkb.decode([r["geometry"]])
        got[(r["aid"], r["bid"])] = polygon_area(ga.geom_parts(0))
    exp = _oracle_pairs(A, B, "intersection")
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], rel=1e-9)


def _diff_oracle(A, B):
    exp = {}
    for i, a in enumerate(A):
        rights = [
            [[_box_ring(*b)]]
            for b in B
            if not (a[2] < b[0] or a[0] > b[2] or a[3] < b[1] or a[1] > b[3])
        ]
        parts = overlay_parts([[[_box_ring(*a)]]], rights, "difference")
        exp[i] = polygon_area(parts) if parts else 0.0
    return exp


def test_overlay_difference(spark, frames):
    A, B, dfa, dfb = frames
    res = clean_overlay(dfa, dfb, "difference", left_id="aid").collect()
    got = {}
    for r in res:
        if r["geometry"] is None:
            continue
        ga = wkb.decode([r["geometry"]])
        got[r["aid"]] = polygon_area(ga.geom_parts(0))
    exp = _diff_oracle(A, B)
    exp = {k: v for k, v in exp.items() if v > 0}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], rel=1e-9)


def test_overlay_union_total_area(spark, frames):
    """union how = per-pair intersection rows + both difference sides
    (reference _union, overlay.py:298-307) — area oracle is the sum of the
    per-pair/per-side kernel results."""
    A, B, dfa, dfb = frames
    res = clean_overlay(dfa, dfb, "union", left_id="aid", right_id="bid").collect()
    total = 0.0
    for r in res:
        if r["geometry"] is None:
            continue
        ga = wkb.decode([r["geometry"]])
        total += polygon_area(ga.geom_parts(0))
    exp = (
        sum(_oracle_pairs(A, B, "intersection").values())
        + sum(_diff_oracle(A, B).values())
        + sum(_diff_oracle(B, A).values())
    )
    assert total == pytest.approx(exp, rel=1e-6)


def test_overlay_identity_and_update_row_semantics(spark, frames):
    A, B, dfa, dfb = frames
    ident = clean_overlay(dfa, dfb, "identity", left_id="aid").collect()
    # every left id appears; intersection rows have bid, difference rows null
    aids = {r["aid"] for r in ident}
    assert aids == set(range(len(A)))
    upd = clean_overlay(dfa, dfb, "update", left_id="aid").collect()
    # update = df1-minus-df2 rows + all df2 rows
    assert sum(1 for r in upd if r["aid"] is None) == len(B)


def test_dissexp_matches_numpy_union(spark, frames):
    A, _, dfa, _ = frames
    res = dissexp(dfa).collect()
    got_total = 0.0
    for r in res:
        ga = wkb.decode([r["geometry"]])
        got_total += polygon_area(ga.geom_parts(0))
    exp_parts = union_all([[[_box_ring(*a)]] for a in A])
    assert got_total == pytest.approx(polygon_area(exp_parts), rel=1e-9)
    assert len(res) == len(exp_parts)


def test_dissexp_by_cluster_equals_dissexp(spark, frames):
    """Reference invariant (test_buffdissexp.py:20-47): cluster-dissolve
    ≡ plain dissolve."""
    A, _, dfa, _ = frames
    plain = dissexp(dfa).collect()
    byc = dissexp_by_cluster(dfa).collect()
    a1 = sorted(
        round(polygon_area(wkb.decode([r["geometry"]]).geom_parts(0)), 6)
        for r in plain
    )
    a2 = sorted(
        round(polygon_area(wkb.decode([r["geometry"]]).geom_parts(0)), 6)
        for r in byc
    )
    assert a1 == a2


def test_buffdissexp_two_points_lens(spark):
    r, d = 400.0, 500.0
    df = spark.createDataFrame(
        [
            (0, bytearray(wkb.encode_point(250000.0, 6600000.0))),
            (1, bytearray(wkb.encode_point(250000.0 + d, 6600000.0))),
        ],
        "pid long, geometry binary",
    )
    res = buffdissexp(df, r, quad_segs=16).collect()
    assert len(res) == 1
    area = polygon_area(wkb.decode([res[0]["geometry"]]).geom_parts(0))
    lens = 2 * r * r * np.arccos(d / (2 * r)) - (d / 2) * np.sqrt(4 * r * r - d * d)
    assert area == pytest.approx(2 * np.pi * r * r - lens, rel=2e-3)


def test_connected_components_chain(spark):
    """A 40-long chain converges via pointer jumping (far fewer than 40
    hash-min rounds)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src long, dst long"
    )
    verts = spark.range(41).withColumnRenamed("id", "v").selectExpr("v as id")
    comp = connected_components(edges, verts, id_col="id", max_iter=12)
    rows = comp.collect()
    assert all(r["component"] == 0 for r in rows)


def test_cluster_points_within_distance_vs_union_find(spark):
    rng = np.random.RandomState(5)
    n = 120
    xs = 250000.0 + rng.rand(n) * 20000
    ys = 6600000.0 + rng.rand(n) * 20000
    d = 1500.0
    df = spark.createDataFrame(
        [(int(i), float(xs[i]), float(ys[i])) for i in range(n)],
        "uid long, x double, y double",
    )
    got = {
        r["uid"]: r["cluster"]
        for r in cluster_points_within_distance(df, d, "uid").collect()
    }
    # union-find oracle
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(i + 1, n):
            if (xs[i] - xs[j]) ** 2 + (ys[i] - ys[j]) ** 2 < d * d:
                parent[find(i)] = find(j)
    # min-id per component
    comp_min = {}
    for i in range(n):
        root = find(i)
        comp_min[root] = min(comp_min.get(root, i), i)
    exp = {i: comp_min[find(i)] for i in range(n)}
    assert got == exp
