"""Per-domain crawl-budget operators (operators/domains.py)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from ssb_sgis_spark.operators.domains import per_domain_latest, per_key_topk

SF_SMOKE = "/root/testdata/sf0.001"


def _naive_topk(df, key, order_by, k):
    w = Window.partitionBy(key).orderBy(*order_by)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")


def test_salted_topk_equals_naive_window_on_hot_key(spark):
    # one domain holds 10^4x the rows of the others — the skew shape the
    # salted stage exists for; results must still be exactly the naive top-k
    hot = spark.range(0, 20000).select(
        F.lit("hot.no").alias("dom"), F.col("id").alias("uid"), (F.col("id") % 97).alias("score")
    )
    cold = spark.range(20000, 20040).select(
        F.concat(F.lit("cold"), (F.col("id") % 8).cast("string"), F.lit(".no")).alias("dom"),
        F.col("id").alias("uid"),
        (F.col("id") % 97).alias("score"),
    )
    df = hot.unionByName(cold)
    order = [F.desc("score"), F.desc("uid")]
    got = per_key_topk(df, "dom", order, k=5, tie_id="uid", nsalts=16)
    want = _naive_topk(df, "dom", order, 5)
    assert sorted(got.collect()) == sorted(want.collect())
    # hard bound: no key exceeds k rows
    counts = got.groupBy("dom").count().collect()
    assert all(r["count"] <= 5 for r in counts)


def test_per_domain_latest_keeps_newest(spark):
    from ssb_sgis_spark.sources.pages import pages_df

    pages = pages_df(spark, SF_SMOKE, with_payload=True).select("uid", "url", "warc_ts")
    kept = per_domain_latest(pages, k=1)
    # warc_ts = epoch + uid seconds, so newest == max uid per domain
    want = (
        pages.withColumn("dom", F.regexp_extract("url", r"https?://([^/]+)/", 1))
        .groupBy("dom")
        .agg(F.max("uid").alias("uid"))
    )
    got = {(r["domain"], r["uid"]) for r in kept.select("domain", "uid").collect()}
    exp = {(r["dom"], r["uid"]) for r in want.collect()}
    assert got == exp


def test_nsalts_one_falls_back_to_single_window(spark):
    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("dom"), F.col("id").alias("uid")
    )
    order = [F.desc("uid")]
    got = per_key_topk(df, "dom", order, k=2, tie_id="uid", nsalts=1)
    want = _naive_topk(df, "dom", order, 2)
    assert sorted(got.collect()) == sorted(want.collect())


def test_topk_preserves_caller_salt_rn_columns(spark):
    """Frames already carrying _salt/_rn (e.g. output of another salted
    operator) must pass through untouched."""
    df = spark.range(0, 100).select(
        F.lit("d.no").alias("dom"),
        F.col("id").alias("uid"),
        (F.col("id") % 7).alias("_salt"),
        (F.col("id") % 11).alias("_rn"),
    )
    out = per_key_topk(df, "dom", [F.desc("uid")], k=3, tie_id="uid", nsalts=4)
    rows = sorted(out.collect(), key=lambda r: -r.uid)
    assert [r.uid for r in rows] == [99, 98, 97]
    assert [(r._salt, r._rn) for r in rows] == [(99 % 7, 99 % 11), (98 % 7, 98 % 11), (97 % 7, 97 % 11)]
