"""HITS hubs & authorities (operators/linkgraph.py)."""

import pytest

from ssb_sgis_spark.operators.linkgraph import R0_MICRO, hits


def test_hits_star_graph(spark):
    """Star: node 0 links to 1, 2, 3.  Node 0 is the only hub (max-norm
    1e6), the leaves are the (equal) top authorities, and authority
    never flows back to 0."""
    nodes = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    edges = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "src long, dst long")
    out = {r.doc_id: (r.hub_micro, r.auth_micro) for r in hits(nodes, edges).collect()}
    assert out[0] == (R0_MICRO, 0)
    assert out[1] == out[2] == out[3] == (0, R0_MICRO)


def test_hits_authority_concentrates(spark):
    """Two hubs both cite node 3; node 4 has a single citation — node 3
    must out-rank node 4 on authority, hubs 0/1 outrank the non-linker."""
    nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 3), (1, 3), (1, 4)], "src long, dst long"
    )
    out = {r.doc_id: (r.hub_micro, r.auth_micro) for r in hits(nodes, edges).collect()}
    assert out[3][1] == R0_MICRO and out[3][1] > out[4][1]
    assert out[1][0] == R0_MICRO  # cites both top authorities -> top hub
    assert out[2] == (0, 0)


def test_hits_empty_graph_raises(spark):
    nodes = spark.createDataFrame([(1,)], "doc_id long")
    edges = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="at least one edge"):
        hits(nodes, edges)
