"""Fixed-point integer PageRank + closed-form link edges."""

from pyspark.sql import functions as F

from ssb_sgis_spark.operators.linkgraph import (
    R0_MICRO,
    TELEPORT_MICRO,
    link_edges,
    pagerank,
)


def test_pagerank_hand_computed(spark):
    """3-node graph, 1 round, every value checked by hand:
    edges 0->1, 1->2, 2->0, 2->1 (outdeg: 0:1, 1:1, 2:2)."""
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 1)], "src long, dst long"
    )
    out = {r.doc_id: r.rank_micro for r in pagerank(nodes, edges, n_iter=1).collect()}
    half = R0_MICRO // 2
    assert out[0] == TELEPORT_MICRO + (85 * half) // 100
    assert out[1] == TELEPORT_MICRO + (85 * (R0_MICRO + half)) // 100
    assert out[2] == TELEPORT_MICRO + (85 * R0_MICRO) // 100


def test_pagerank_no_inlinks_settles_at_teleport(spark):
    """A vertex nothing links to holds exactly the teleport mass after
    any number of rounds."""
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    edges = spark.createDataFrame([(0, 1), (1, 0), (2, 0)], "src long, dst long")
    out = {r.doc_id: r.rank_micro for r in pagerank(nodes, edges, n_iter=3).collect()}
    assert out[2] == TELEPORT_MICRO


def test_link_edges_shape(spark):
    """Node i emits exactly 1 + i%4 edges, all dsts in [0, n)."""
    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    e = link_edges(docs, n=40)
    per = {r.src: r.cnt for r in e.groupBy("src").agg(F.count("*").alias("cnt")).collect()}
    assert all(per[i] == 1 + i % 4 for i in range(40))
    lo, hi = e.agg(F.min("dst"), F.max("dst")).first()
    assert 0 <= lo and hi < 40
