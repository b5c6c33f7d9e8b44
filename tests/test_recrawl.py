"""Recrawl estimation: change counting, buckets, adaptive intervals."""

from datetime import datetime

from tests.conftest import SF_SMOKE


def _hist(spark, rows):
    return spark.createDataFrame(rows, "url string, fetch_ts timestamp, digest string")


def test_change_counting_and_buckets(spark):
    from ssb_sgis_spark.operators.recrawl import estimate_change_rates

    d = lambda day: datetime(2024, 1, day)
    rows = (
        # hot: changes every day (4/4 intervals)
        [("hot", d(i), f"h{i}") for i in range(1, 6)]
        # frozen: never changes
        + [("frozen", d(i), "same") for i in range(1, 6)]
        # warm: 1 change in 4 intervals (1*4 >= 4)
        + [("warm", d(1), "a"), ("warm", d(2), "a"), ("warm", d(3), "b"),
           ("warm", d(4), "b"), ("warm", d(5), "b")]
        # single fetch: no intervals -> NULL bucket
        + [("single", d(1), "x")]
    )
    got = {r.url: r for r in estimate_change_rates(_hist(spark, rows)).collect()}
    assert (got["hot"].n_intervals, got["hot"].n_changes, got["hot"].bucket) == (4, 4, "hot")
    assert got["hot"].mean_interval_s == 86400 and got["hot"].next_fetch_s == 43200
    assert got["frozen"].bucket == "frozen" and got["frozen"].next_fetch_s == 4 * 86400
    assert got["warm"].bucket == "warm" and got["warm"].next_fetch_s == 86400
    assert got["single"].n_intervals == 0 and got["single"].bucket is None
    assert got["single"].next_fetch_s is None


def test_cold_bucket_doubles(spark):
    from ssb_sgis_spark.operators.recrawl import estimate_change_rates

    d = lambda day: datetime(2024, 1, day)
    rows = [("cold", d(i), "a" if i < 10 else "b") for i in range(1, 11)]  # 1/9
    r = estimate_change_rates(_hist(spark, rows)).first()
    assert r.bucket == "cold" and r.next_fetch_s == 2 * r.mean_interval_s


def test_law_matches_arithmetic(spark):
    """Window pipeline over the synthetic history == pure uid
    arithmetic: changes = #{f in 1..5 : floor(f/m) != floor((f-1)/m)}."""
    from ssb_sgis_spark.operators.recrawl import (
        estimate_change_rates,
        fetch_history_df,
    )
    from ssb_sgis_spark.sources.pages import pages_df

    pages = pages_df(spark, SF_SMOKE).limit(500)
    got = {r.url: r for r in
           estimate_change_rates(fetch_history_df(pages)).collect()}
    for p in pages.collect():
        m = 1 + p.uid % 7
        changes = sum(1 for f in range(1, 6) if f // m != (f - 1) // m)
        r = got[p.url]
        assert (r.n_intervals, r.n_changes, r.mean_interval_s) == (5, changes, 86400)
        exp_bucket = ("hot" if 4 * changes >= 15 else
                      "warm" if 4 * changes >= 5 else
                      "cold" if changes > 0 else "frozen")
        assert r.bucket == exp_bucket, (p.uid, m, changes)
