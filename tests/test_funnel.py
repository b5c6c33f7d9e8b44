"""Event funnel (operators/funnel.py)."""

import datetime as dt

from ssb_sgis_spark.operators.funnel import funnel_counts


def _ev(spark, rows):
    t0 = dt.datetime(2024, 1, 1)
    data = [
        (i, t0 + dt.timedelta(minutes=m), u, ty) for i, (u, m, ty) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )


def test_funnel_order_and_window(spark):
    week_min = 7 * 24 * 60
    rows = [
        # user 1: full funnel in order -> reaches step 3
        (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
        # user 2: purchase BEFORE click -> stops at step 2
        (2, 0, "view"), (2, 10, "purchase"), (2, 20, "click"),
        # user 3: click before view -> stops at step 1
        (3, 5, "view"), (3, 0, "click"),
        # user 4: full funnel but purchase lands past the 1-week window
        (4, 0, "view"), (4, 10, "click"), (4, week_min + 30, "purchase"),
        # user 5: never views -> counts nowhere
        (5, 0, "click"), (5, 10, "purchase"),
        # user 6: several touches; FIRST view anchors the chain
        (6, 0, "view"), (6, 1, "view"), (6, 2, "click"), (6, 3, "purchase"),
    ]
    out = {r.step: r.n_users for r in funnel_counts(_ev(spark, rows)).collect()}
    assert out == {1: 5, 2: 4, 3: 2}


def test_funnel_steps_are_nested(spark):
    rows = [(u, m, ty) for u in range(20)
            for m, ty in [(0, "view"), (1, "click"), (2, "purchase")]
            if (u + m) % 3 != 0]
    out = {r.step: r.n_users for r in funnel_counts(_ev(spark, rows)).collect()}
    assert out[1] >= out[2] >= out[3]


def test_rolling_rate_trailing_window(spark):
    """Hand-checkable trailing-hour counts, boundary inclusive."""
    from ssb_sgis_spark.operators.sessions import rolling_rate

    rows = [
        (1, 0, "view"),      # t=0        -> 1 in [t-1h, t]
        (1, 30, "view"),     # t=30min    -> 2
        (1, 60, "view"),     # t=60min    -> 3 (t-1h = 0 inclusive)
        (1, 61, "view"),     # t=61min    -> 3 (t=0 fell out)
        (1, 300, "view"),    # far later  -> 1
        (2, 10, "view"),     # other user independent -> 1
    ]
    ev = _ev(spark, [(u, m, ty) for u, m, ty in rows])
    out = rolling_rate(ev, burst_threshold=3)
    got = {r.event_id: (r.n_trailing, r.burst) for r in out.collect()}
    assert got == {0: (1, 0), 1: (2, 0), 2: (3, 1), 3: (3, 1), 4: (1, 0), 5: (1, 0)}
