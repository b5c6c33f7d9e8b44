"""Temporal as-of join (operators/asof.py)."""

from ssb_sgis_spark.operators.asof import asof_join


def _left(spark, rows):
    return spark.createDataFrame(rows, "k long, ts_us long, event_id long")


def _right(spark, rows):
    return spark.createDataFrame(rows, "k long, ts_us long, val string, extra long")


def test_asof_backward_semantics(spark):
    left = _left(
        spark,
        [
            (1, 9, 100),   # before first right row -> NULL payload
            (1, 15, 101),  # between 10 and 20 -> 'a'
            (1, 20, 102),  # tie with right ts=20 -> 'b' (>= semantics)
            (1, 99, 103),  # after everything -> 'b'
            (2, 50, 104),  # key with no right rows -> NULL payload
        ],
    )
    right = _right(spark, [(1, 10, "a", 7), (1, 20, "b", 8)])
    out = {
        r.event_id: (r.val, r.extra)
        for r in asof_join(left, right, on="k").collect()
    }
    assert out == {
        100: (None, None),
        101: ("a", 7),
        102: ("b", 8),
        103: ("b", 8),
        104: (None, None),
    }
    # exactly len(left) rows, left columns preserved
    assert asof_join(left, right, on="k").columns == [
        "k", "ts_us", "event_id", "val", "extra",
    ]


def test_asof_null_payload_fields_do_not_splice(spark):
    """A right row whose payload contains NULLs must still win whole —
    not fall through per-column to an older row's values."""
    left = _left(spark, [(1, 30, 100)])
    right = _right(spark, [(1, 10, "old", 7), (1, 20, None, None)])
    row = asof_join(left, right, on="k").collect()[0]
    assert row.val is None and row.extra is None


def test_asof_right_ts_tie_breaks_by_first_value_col(spark):
    """Two right rows at the same (key, ts): the max first-value-col row
    wins deterministically."""
    left = _left(spark, [(1, 10, 100), (1, 11, 101)])
    right = _right(spark, [(1, 10, "a", 1), (1, 10, "b", 2)])
    out = {r.event_id: r.val for r in asof_join(left, right, on="k").collect()}
    assert out == {100: "b", 101: "b"}


def test_asof_prefix_and_collision(spark):
    left = _left(spark, [(1, 10, 100)])
    right = spark.createDataFrame(
        [(1, 5, 9)], "k long, ts_us long, event_id long"
    )
    import pytest

    with pytest.raises(ValueError, match="collides"):
        asof_join(left, right, on="k")
    out = asof_join(left, right, on="k", right_prefix="crawl_").collect()[0]
    assert out.crawl_event_id == 9


def test_asof_plan_is_single_window_no_bnlj(spark):
    """The whole join must be exchange+sort+window — no nested-loop or
    cartesian fallback anywhere in the plan."""
    left = _left(spark, [(1, 9, 100)])
    right = _right(spark, [(1, 10, "a", 7)])
    plan = asof_join(left, right, on="k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
