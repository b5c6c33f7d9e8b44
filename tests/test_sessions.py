"""Gap-based sessionization."""

import datetime as dt

from ssb_sgis_spark.operators.sessions import session_stats, sessionize


def _ev(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: 3 events within gaps, then a 31-min jump -> 2 sessions
        (0, t0, 1, 2.00),
        (1, t0 + dt.timedelta(minutes=10), 1, 3.50),
        (2, t0 + dt.timedelta(minutes=20), 1, 1.25),
        (3, t0 + dt.timedelta(minutes=51), 1, 4.00),
        # user 2: single event
        (4, t0 + dt.timedelta(minutes=5), 2, 9.99),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )


def test_sessionize_gap_boundary(spark):
    out = {r.event_id: r.session_id for r in sessionize(_ev(spark)).collect()}
    assert out == {0: 1, 1: 1, 2: 1, 3: 2, 4: 1}


def test_session_stats_exact(spark):
    rows = {
        (r.user_id, r.session_id): (r.n_events, r.value_cents)
        for r in session_stats(_ev(spark)).collect()
    }
    assert rows[(1, 1)] == (3, 675)   # 200 + 350 + 125
    assert rows[(1, 2)] == (1, 400)
    assert rows[(2, 1)] == (1, 999)


def test_exactly_30min_gap_stays_in_session(spark):
    """The rule is STRICTLY greater than the gap."""
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(0, t0, 1, 1.0), (1, t0 + dt.timedelta(minutes=30), 1, 1.0)],
        "event_id long, ts timestamp_ntz, user_id long, value double",
    )
    out = {r.event_id: r.session_id for r in sessionize(df).collect()}
    assert out == {0: 1, 1: 1}


def test_cohort_retention_triangle(spark):
    """Hand-built triangle: user 1 active weeks 0,1,3 (cohort 0); user 2
    weeks 0,1 (cohort 0); user 3 week 1 only (cohort 1).  Duplicate
    events within a week must not double-count."""
    import datetime as dt

    from ssb_sgis_spark.operators.sessions import WEEK_US, cohort_retention

    def at_week(w, extra_s=0):
        return dt.datetime(1970, 1, 1) + dt.timedelta(
            seconds=w * (WEEK_US // 1_000_000) + extra_s
        )

    rows = [
        (1, 1, at_week(0)), (2, 1, at_week(0, 60)),  # dup week for u1
        (3, 1, at_week(1)), (4, 1, at_week(3)),
        (5, 2, at_week(0)), (6, 2, at_week(1)),
        (7, 3, at_week(1)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in cohort_retention(df).collect()
    }
    assert got == {
        (0, 0): 2,  # users 1, 2
        (0, 1): 2,  # both active week 1
        (0, 3): 1,  # only user 1
        (1, 0): 1,  # user 3's cohort
    }
