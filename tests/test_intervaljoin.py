"""Chunk-bucketed interval-overlap join (operators/intervaljoin)."""

import io
import contextlib

from pyspark.sql import functions as F

from ssb_sgis_spark.operators.intervaljoin import interval_join


def _mk(spark, pts, ivs):
    p = spark.createDataFrame(pts, ["pid", "t"])
    i = spark.createDataFrame(ivs, ["iid", "s", "e"])
    return p, i


def _run(spark, pts, ivs, chunk=10):
    p, i = _mk(spark, pts, ivs)
    got = interval_join(p, i, "t", "s", "e", chunk).collect()
    return {(r.pid, r.iid) for r in got}


def _brute(pts, ivs):
    return {
        (pid, iid)
        for pid, t in pts
        for iid, s, e in ivs
        if s <= t < e
    }


def test_half_open_boundaries(spark):
    ivs = [(0, 10, 20)]
    pts = [(0, 9), (1, 10), (2, 19), (3, 20)]
    assert _run(spark, pts, ivs) == {(1, 0), (2, 0)}


def test_chunk_boundary_crossing_interval(spark):
    # interval spans 3 chunks; points in each chunk all match once
    ivs = [(7, 5, 35)]
    pts = [(0, 5), (1, 14), (2, 25), (3, 34), (4, 35)]
    got = _run(spark, pts, ivs, chunk=10)
    assert got == {(0, 7), (1, 7), (2, 7), (3, 7)}


def test_empty_and_inverted_intervals_are_dropped(spark):
    ivs = [(0, 10, 10), (1, 20, 15), (2, 0, 100)]
    pts = [(0, 10), (1, 17)]
    assert _run(spark, pts, ivs) == {(0, 2), (1, 2)}


def test_matches_python_brute(spark):
    pts = [(i, (i * 37) % 500) for i in range(200)]
    ivs = [(w, w * 9 % 480, w * 9 % 480 + 1 + (w * 13) % 60) for w in range(50)]
    ivs = [(w, s, e) for w, s, e in ivs if e > s]
    assert _run(spark, pts, ivs, chunk=16) == _brute(pts, ivs)


def test_plan_is_equi_join_not_nested_loop(spark):
    p, i = _mk(spark, [(0, 5)], [(0, 0, 10)])
    df = interval_join(p, i, "t", "s", "e", 10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the equi-key is the manufactured bucket; the naive formulation of
    # the SAME predicate nested-loops, which is the point of the operator
    naive = p.join(i, (F.col("t") >= F.col("s")) & (F.col("t") < F.col("e")))
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        naive.explain("formatted")
    naive_plan = buf2.getvalue()
    assert (
        "BroadcastNestedLoopJoin" in naive_plan
        or "CartesianProduct" in naive_plan
    )
