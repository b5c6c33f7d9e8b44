"""Bucketed co-located joins (operators/bucketed.py): the join of two
tables bucketed on the join key must plan with ZERO Exchange."""

from pyspark.sql import functions as F

from ssb_sgis_spark.operators.bucketed import (
    plan_exchange_count,
    read_table,
    write_bucketed,
)


def test_bucketed_join_has_zero_exchange(spark):
    left = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("score")
    )
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13).alias("label")
    )
    write_bucketed(left, "bk_left", "doc_id", 8)
    write_bucketed(right, "bk_right", "doc_id", 8)
    l, r = read_table(spark, "bk_left"), read_table(spark, "bk_right")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = l.join(r, "doc_id")
        assert plan_exchange_count(j) == 0, "bucketed join must not shuffle"
        # and it is still CORRECT: same rows as the plain join
        assert j.count() == 5_000
        plain = left.join(right, "doc_id")
        assert plan_exchange_count(plain) > 0  # the shuffle it saves
        assert plain.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_bucketed_groupby_on_bucket_key_has_zero_exchange(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 500).alias("site"), F.col("id").alias("v")
    )
    write_bucketed(df, "bk_sites", "site", 8)
    try:
        g = read_table(spark, "bk_sites").groupBy("site").agg(F.sum("v"))
        assert plan_exchange_count(g) == 0
        assert g.count() == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_sites")
