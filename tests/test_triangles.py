"""Per-vertex triangle counts (operators/linkgraph.triangle_counts)."""

from itertools import combinations

from pyspark.sql import functions as F

from ssb_sgis_spark.operators.linkgraph import link_edges, triangle_counts


def _reference_triangles(node_ids, edge_list):
    """Brute-force python reference: adjacency sets, count id-ordered
    closed triples, scatter to the three vertices."""
    adj = {v: set() for v in node_ids}
    for a, b in edge_list:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    counts = {v: 0 for v in node_ids}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                if v in counts:
                    counts[v] += 1
    return counts


def _run(spark, node_ids, edge_list):
    nodes = spark.createDataFrame([(v,) for v in node_ids], ["doc_id"])
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = triangle_counts(nodes, edges).collect()
    return {r.doc_id: r.triangles for r in got}


def test_k4_every_vertex_in_three_triangles(spark):
    nodes = [0, 1, 2, 3]
    edges = [(a, b) for a in nodes for b in nodes if a < b]
    got = _run(spark, nodes, edges)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_star_has_no_triangles_until_closed(spark):
    # hub 0 with 6 leaves: zero triangles; closing one leaf pair makes 1
    star = [(0, i) for i in range(1, 7)]
    nodes = list(range(7))
    assert _run(spark, nodes, star) == {v: 0 for v in nodes}
    got = _run(spark, nodes, star + [(1, 2)])
    assert got == {0: 1, 1: 1, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0}


def test_duplicate_reverse_and_self_edges_collapse(spark):
    # parallel, reversed and self edges must not inflate counts
    edges = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0), (2, 2)]
    got = _run(spark, [0, 1, 2, 3], edges)
    assert got == {0: 1, 1: 1, 2: 1, 3: 0}


def test_law_graph_matches_python_reference(spark):
    n = 200
    nodes = list(range(n))
    docs = spark.createDataFrame([(v,) for v in nodes], ["doc_id"])
    edge_list = [
        (r.src, r.dst) for r in link_edges(docs, n=n).collect()
    ]
    got = _run(spark, nodes, edge_list)
    assert got == _reference_triangles(nodes, edge_list)
    assert sum(got.values()) > 0  # the law graph does contain triangles


def test_isolated_vertices_report_zero(spark):
    got = _run(spark, [0, 1, 2, 99], [(0, 1), (1, 2), (2, 0)])
    assert got[99] == 0
