"""Network operators vs driver-side graph oracle (unit-weight lattice:
least cost == Manhattan index distance; routes checked for validity +
optimality, frequencies for conservation)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ssb_sgis_spark.operators.network import (
    get_route,
    get_route_frequencies,
    make_node_ids,
    make_directed_network,
    od_cost_matrix,
)
from ssb_sgis_spark.sources.roads import NX, roads_df


@pytest.fixture(scope="module")
def lattice(spark):
    lines, nodes = make_node_ids(roads_df(spark))
    edges = make_directed_network(
        lines.withColumn("weight", F.lit(1.0)), "oneway"
    ).localCheckpoint(eager=False)
    return edges


def _ids(spark, node_ids, name):
    return spark.createDataFrame(
        [(int(n), int(n)) for n in node_ids], f"{name} long, node_id long"
    )


def test_od_cost_matrix_manhattan(spark, lattice):
    orig = _ids(spark, [0, 5 * NX + 3, 20 * NX + 20], "origin")
    dest = _ids(spark, [7, 10 * NX + 10], "destination")
    res = od_cost_matrix(lattice, orig, dest)
    got = {(r["origin"], r["destination"]): r["cost"] for r in res.collect()}
    for o in [0, 5 * NX + 3, 20 * NX + 20]:
        for d in [7, 10 * NX + 10]:
            exp = abs(o % NX - d % NX) + abs(o // NX - d // NX)
            assert got[(o, d)] == pytest.approx(float(exp))


def test_od_cutoff_and_destination_count(spark, lattice):
    orig = _ids(spark, [0], "origin")
    dest = _ids(spark, [1, 2, 3, NX, 5 * NX], "destination")
    res = od_cost_matrix(lattice, orig, dest, cutoff=2.0).collect()
    assert {r["destination"] for r in res} == {1, 2, NX}
    res2 = od_cost_matrix(lattice, orig, dest, destination_count=2).collect()
    assert len(res2) == 2
    assert {r["destination"] for r in res2} == {1, NX}  # cost-1 ties by id


def test_get_route_valid_and_optimal(spark, lattice):
    orig = _ids(spark, [0], "origin")
    dest = _ids(spark, [3 * NX + 4], "destination")
    rows = sorted(get_route(lattice, orig, dest).collect(), key=lambda r: r["seq"])
    # connected path from 0 to destination with optimal length 7
    assert rows[0]["src"] == 0
    assert rows[-1]["dst"] == 3 * NX + 4
    for a, b in zip(rows[:-1], rows[1:]):
        assert a["dst"] == b["src"]
    assert len(rows) == 7
    # every hop is a lattice edge
    for r in rows:
        d = abs(r["src"] - r["dst"])
        assert d in (1, NX)


def test_route_frequencies_conservation(spark, lattice):
    orig = _ids(spark, [0, 2], "origin")
    dest = _ids(spark, [5 * NX + 5], "destination")
    freq = get_route_frequencies(lattice, orig, dest).collect()
    # total traversals = sum of path lengths = sum of manhattan distances
    total = sum(r["frequency"] for r in freq)
    exp = (5 + 5) + (3 + 5)
    assert total == exp


def test_close_network_holes(spark):
    """Two collinear segments with a 1m gap: filled at max_angle=180;
    NOT filled when the angle window excludes the new line's direction."""
    from ssb_sgis_spark.kernels import wkb as wkbk
    from ssb_sgis_spark.operators.network import (
        close_network_holes,
        close_network_holes_to_deadends,
    )
    import numpy as np

    def line(*pts):
        return bytearray(wkbk.encode_linestring(np.array(pts, dtype=float)))

    X, Y = 300000.0, 6600000.0
    df = spark.createDataFrame(
        [
            (0, line((X, Y), (X + 100, Y))),
            (1, line((X + 101, Y), (X + 200, Y))),
        ],
        "lid long, geometry binary",
    )
    filled = close_network_holes(df, max_distance=1.5, max_angle=180)
    # both deadends qualify, each adds its own line (the reference's
    # new_sources dedup is per source deadend, so gaps fill both ways)
    assert filled.filter(F.col("hole") == 1).count() == 2
    assert filled.count() == 4

    # gap wider than max_distance -> nothing added
    none = close_network_holes(df, max_distance=0.5, max_angle=180)
    assert none.filter(F.col("hole") == 1).count() == 0

    # deadend-to-deadend variant: one line per unordered pair
    d2d = close_network_holes_to_deadends(df, max_distance=1.5)
    assert d2d.filter(F.col("hole") == 1).count() == 1


def test_close_network_holes_angle_filter(spark):
    """A perpendicular candidate node within range is rejected when
    max_angle is small (reference get_angle abs-difference metric)."""
    from ssb_sgis_spark.kernels import wkb as wkbk
    from ssb_sgis_spark.operators.network import close_network_holes
    import numpy as np

    def line(*pts):
        return bytearray(wkbk.encode_linestring(np.array(pts, dtype=float)))

    X, Y = 300000.0, 6600000.0
    # deadend of a west-east line at (X+100, Y); candidate node 1m NORTH
    # belongs to another west-east line, so BOTH deadends see a
    # perpendicular fill: |angle| differences are 90 on each side
    df = spark.createDataFrame(
        [
            (0, line((X, Y), (X + 100, Y))),
            (1, line((X + 100, Y + 1), (X + 150, Y + 1))),
        ],
        "lid long, geometry binary",
    )
    tight = close_network_holes(df, max_distance=1.5, max_angle=30)
    assert tight.filter(F.col("hole") == 1).count() == 0
    wide = close_network_holes(df, max_distance=1.5, max_angle=120)
    assert wide.filter(F.col("hole") == 1).count() >= 1


def test_get_k_routes_distinct_and_ordered(spark, lattice):
    """k=3 routes on the unit lattice: k=1 is optimal (Manhattan cost);
    later ks are >= and edge-disjoint in the dropped middle."""
    from ssb_sgis_spark.operators.network import get_k_routes

    orig = _ids(spark, [0], "origin")
    dest = _ids(spark, [5 * NX + 5], "destination")
    res = get_k_routes(lattice, orig, dest, k=3, drop_middle_percent=50)
    rows = res.collect()
    by_k = {}
    for r in rows:
        by_k.setdefault(r["k"], []).append((r["seq"], r["src"], r["dst"]))
    assert 1 in by_k and len(by_k) >= 2  # at least 2 alternatives on a lattice
    costs = {k: len(v) for k, v in by_k.items()}  # unit weights: cost = edges
    assert costs[1] == 10  # Manhattan optimum
    for k in sorted(costs)[1:]:
        assert costs[k] >= costs[1]
    # path is a connected edge sequence
    for k, v in by_k.items():
        v.sort()
        for (s1, _, d1), (s2, s_2, _) in zip(v, v[1:]):
            assert d1 == s_2


def test_precice_service_area_cuts_boundary_edges(spark):
    """Origin at node 0 of a 1-weighted lattice, break 2.5: whole edges
    within cost 2, boundary edges cut at remaining 0.5 (prefix length
    0.5 * LATTICE_STEP)."""
    from ssb_sgis_spark.kernels import wkb as wkbk
    from ssb_sgis_spark.operators.network import (
        make_directed_network,
        make_node_ids,
        precice_service_area,
    )
    from ssb_sgis_spark.kernels.geom import length as geom_length

    lines, nodes = make_node_ids(roads_df(spark))
    edges = make_directed_network(
        lines.withColumn("weight", F.lit(1.0)), "oneway"
    )
    orig = _ids(spark, [0], "origin")
    res = precice_service_area(edges, orig, [2.5], weight_col="weight")
    rows = res.collect()
    assert rows
    # every returned source node has cost <= 2.5 by construction; count
    # cut rows: boundary edges (source cost exactly 2) appear cut
    import numpy as np
    ga = wkbk.decode([r["geometry"] for r in rows])
    lens = [geom_length(ga)[g] for g in range(len(ga))]
    # lattice step length
    full = max(lens)
    cut = [l for l in lens if l < full * 0.99]
    assert cut, "expected some cut prefix pieces"
    for l in cut:
        assert l == pytest.approx(full * 0.5, rel=1e-6)


def test_split_lines_by_nearest_point(spark):
    """A point 1m from the middle of a line splits it in two; a point
    snapping to an endpoint splits nothing; points beyond max_distance
    split nothing."""
    from ssb_sgis_spark.kernels import wkb as wkbk
    from ssb_sgis_spark.operators.lineops import split_lines_by_nearest_point

    def line(*pts):
        return bytearray(wkbk.encode_linestring(np.array(pts, dtype=float)))

    X, Y = 300000.0, 6600000.0
    lines = spark.createDataFrame(
        [
            (0, line((X, Y), (X + 100, Y))),
            (1, line((X, Y + 50), (X + 100, Y + 50))),
        ],
        "lid long, geometry binary",
    )
    points = spark.createDataFrame(
        [
            (X + 30.0, Y + 1.0),    # splits line 0 at s=30
            (X + 0.0, Y + 51.0),    # endpoint snap on line 1 -> no split
            (X + 70.0, Y + 30.0),   # 20m away -> beyond max_distance
        ],
        "x double, y double",
    )
    out = split_lines_by_nearest_point(
        lines, points, max_distance=5.0, splitted_col="was_split"
    )
    rows = out.collect()
    assert len(rows) == 3  # line 0 -> 2 pieces, line 1 unchanged
    split_rows = [r for r in rows if r["was_split"] == 1]
    assert len(split_rows) == 2 and all(r["lid"] == 0 for r in split_rows)
    from ssb_sgis_spark.kernels.geom import length as geom_length
    ga = wkbk.decode([r["geometry"] for r in split_rows])
    lens = sorted(geom_length(ga))
    assert lens[0] == pytest.approx(30.0) and lens[1] == pytest.approx(70.0)
    # plan sanity: the point-line candidate join must be an equi (hash)
    # join on the quadtree cell, never a nested-loop bbox theta join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan[:2000]


def test_change_line_endpoint(spark):
    from ssb_sgis_spark.kernels import wkb as wkbk
    from ssb_sgis_spark.operators.lineops import change_line_endpoint

    def line(*pts):
        return bytearray(wkbk.encode_linestring(np.array(pts, dtype=float)))

    X, Y = 300000.0, 6600000.0
    lines = spark.createDataFrame(
        [(0, line((X, Y), (X + 100, Y))), (1, line((X, Y + 10), (X + 100, Y + 10)))],
        "lid long, geometry binary",
    )
    mapper = spark.createDataFrame([(0, X - 5.0, Y + 5.0)], "lid long, nx double, ny double")
    out = change_line_endpoint(lines, mapper, change_what="first")
    rows = {r["lid"]: r for r in out.collect()}
    ga = wkbk.decode([rows[0]["geometry"]])
    coords = ga.geom_rings(0)[0]
    assert coords[0][0] == pytest.approx(X - 5.0)
    assert coords[0][1] == pytest.approx(Y + 5.0)
    ga1 = wkbk.decode([rows[1]["geometry"]])
    assert ga1.geom_rings(0)[0][0][0] == pytest.approx(X)  # untouched


def test_get_component_size(spark):
    from ssb_sgis_spark.operators.network import get_component_size, make_node_ids

    lines, nodes = make_node_ids(roads_df(spark, broken=True))
    out = get_component_size(lines, nodes)
    sizes = {r["component_size"] for r in out.select("component_size").distinct().collect()}
    assert len(sizes) == 2  # two components with different node counts


def test_traveling_salesman(spark):
    """The reference docstring example: the roundtrip over 8 points has
    the known optimal length (80 + 2*sqrt(200))."""
    from ssb_sgis_spark.operators.tsp import traveling_salesman_problem

    pts = [(0, 0), (10, -10), (10, 10), (0, 10), (0, -10), (10, 0), (20, 0), (0, 20)]
    df = spark.createDataFrame([(float(a), float(b)) for a, b in pts], "x double, y double")
    tour = traveling_salesman_problem(df).collect()
    assert len(tour) == 9  # closed: start repeated
    assert (tour[0]["x"], tour[0]["y"]) == (tour[-1]["x"], tour[-1]["y"])
    length = sum(
        ((a["x"] - b["x"]) ** 2 + (a["y"] - b["y"]) ** 2) ** 0.5
        for a, b in zip(tour, tour[1:])
    )
    # at least as good as the reference docstring's own route
    ref_route = [(0, 0), (10, -10), (0, -10), (10, 0), (20, 0), (10, 10),
                 (0, 10), (0, 20), (0, 0)]
    ref_len = sum(
        ((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2) ** 0.5
        for a, b in zip(ref_route, ref_route[1:])
    )
    assert length <= ref_len + 1e-9

    open_tour = traveling_salesman_problem(df, return_to_start=False).collect()
    assert len(open_tour) == 8
    open_len = sum(
        ((a["x"] - b["x"]) ** 2 + (a["y"] - b["y"]) ** 2) ** 0.5
        for a, b in zip(open_tour, open_tour[1:])
    )
    assert open_len < length


def test_christofides_structure_kernels():
    """MST + odd-matching + Euler-shortcut invariants (the reference's
    christofides pipeline, from scratch in numpy)."""
    import numpy as np

    from ssb_sgis_spark.operators.tsp import (
        _blossom_matching,
        _christofides_tour,
        _greedy_matching,
        _prim_mst,
        _tour_length,
        _two_opt,
    )

    rng = np.random.RandomState(41)
    pts = rng.rand(40, 2) * 100
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))

    mst = _prim_mst(d)
    assert len(mst) == len(pts) - 1  # spanning tree
    deg = np.zeros(len(pts), int)
    for a, b in mst:
        deg[a] += 1
        deg[b] += 1
    odd = [int(v) for v in np.where(deg % 2 == 1)[0]]
    assert len(odd) % 2 == 0  # handshake lemma
    match = _blossom_matching(odd, d)
    assert sorted(v for pair in match for v in pair) == sorted(odd)  # perfect
    # exact matching is never heavier than the old greedy one (round 5)
    greedy = _greedy_matching(odd, d)
    w_exact = sum(d[a, b] for a, b in match)
    w_greedy = sum(d[a, b] for a, b in greedy)
    assert w_exact <= w_greedy + 1e-9

    tour = _christofides_tour(d)
    assert sorted(tour) == list(range(len(pts)))  # hamiltonian
    # 2-opt polish never worsens
    assert _tour_length(_two_opt(tour.copy(), d), d) <= _tour_length(tour, d) + 1e-9


def test_tsp_method_param(spark):
    from ssb_sgis_spark.operators.tsp import traveling_salesman_problem

    pts = [(0.0, 0.0), (3.0, 1.0), (1.0, 4.0), (5.0, 2.0), (2.0, 2.0), (4.0, 5.0)]
    df = spark.createDataFrame(pts, "x double, y double")

    def tour_len(rows):
        return sum(
            ((a["x"] - b["x"]) ** 2 + (a["y"] - b["y"]) ** 2) ** 0.5
            for a, b in zip(rows, rows[1:])
        )

    t_chr = traveling_salesman_problem(df, method="christofides").collect()
    t_nn = traveling_salesman_problem(df, method="nn").collect()
    assert len(t_chr) == len(t_nn) == 7
    # both 2-opt-polished tours land within 30% of each other on tiny n
    assert abs(tour_len(t_chr) - tour_len(t_nn)) <= 0.3 * tour_len(t_nn)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown TSP method"):
        traveling_salesman_problem(df, method="bogus")
