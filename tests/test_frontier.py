"""Frontier scheduling: politeness spacing, caps, fetcher affinity."""

from tests.conftest import SF_SMOKE


def test_schedule_spacing_and_order(spark):
    from ssb_sgis_spark.operators.frontier import schedule_frontier

    rows = [
        ("a/1", "a", 10), ("a/2", "a", 30), ("a/3", "a", 20),
        ("b/1", "b", 5),
    ]
    df = spark.createDataFrame(rows, "url string, host string, priority long")
    got = {r.url: (r.rank, r.fetch_offset_ms) for r in
           schedule_frontier(df, delay_col=2000).collect()}
    # priority DESC within host; offsets spaced by the delay
    assert got["a/2"] == (1, 0)
    assert got["a/3"] == (2, 2000)
    assert got["a/1"] == (3, 4000)
    assert got["b/1"] == (1, 0)


def test_max_per_cycle_cap(spark):
    from ssb_sgis_spark.operators.frontier import schedule_frontier

    rows = [(f"h/{i}", "h", i) for i in range(100)]
    df = spark.createDataFrame(rows, "url string, host string, priority long")
    got = schedule_frontier(df, max_per_cycle=10).collect()
    assert len(got) == 10
    # the cap keeps the TOP-priority rows exactly
    assert {r.url for r in got} == {f"h/{i}" for i in range(90, 100)}
    assert max(r.rank for r in got) == 10


def test_fetcher_affinity(spark):
    from ssb_sgis_spark.operators.frontier import frontier_df, schedule_frontier
    from ssb_sgis_spark.sources.pages import pages_df

    fr = frontier_df(pages_df(spark, SF_SMOKE).limit(2000))
    plan = schedule_frontier(fr, delay_col="delay_ms", n_fetchers=8)
    # one fetcher per host, fetchers in range
    from pyspark.sql import functions as F

    per_host = plan.groupBy("host").agg(F.countDistinct("fetcher")).collect()
    assert all(r[1] == 1 for r in per_host)
    assert plan.selectExpr("max(fetcher)").first()[0] < 8
    assert plan.selectExpr("min(fetcher)").first()[0] >= 0


def test_offsets_respect_per_host_delay(spark):
    from ssb_sgis_spark.operators.frontier import frontier_df, schedule_frontier
    from ssb_sgis_spark.sources.pages import pages_df
    from pyspark.sql import functions as F

    fr = frontier_df(pages_df(spark, SF_SMOKE).limit(2000))
    plan = schedule_frontier(fr, delay_col="delay_ms")
    joined = plan.join(fr.select("url", "delay_ms"), "url")
    bad = joined.filter(
        F.col("fetch_offset_ms") != (F.col("rank") - 1) * F.col("delay_ms")
    )
    assert bad.count() == 0
