"""HLL distinct sketch: register semantics, merge-by-max, estimate
accuracy — behind the `distinct_sketch` oracle query."""

import numpy as np
from pyspark.sql import functions as F


def test_hll_rank_is_leading_zero_bits(spark):
    """rank = 1 + leading zero bits of the 96-bit suffix, computed by
    string arithmetic — cross-check against python int parsing."""
    from ssb_sgis_spark.operators.sketch import hll_register_exprs
    import hashlib

    vals = [f"v{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    _, rank = hll_register_exprs("s")
    got = {
        r.s: r.rank for r in df.select("s", F.expr(rank).alias("rank")).collect()
    }
    for v in vals:
        h = hashlib.md5(v.encode()).hexdigest()[3 : 3 + 24]
        bits = bin(int(h, 16))[2:].zfill(96)
        want = (len(bits) - len(bits.lstrip("0"))) + 1 if int(h, 16) else 97
        assert got[v] == want, v


def test_hll_sketch_invariant_to_duplication(spark):
    """The sketch of a corpus equals the sketch of the corpus with every
    row duplicated — the distinct-ness property."""
    from ssb_sgis_spark.operators.sketch import hll_sketch

    df = spark.range(1000).select(F.concat(F.lit("u"), "id").alias("u"))
    dup = df.unionAll(df).unionAll(df)
    a = sorted(map(tuple, hll_sketch(df, "u").collect()))
    b = sorted(map(tuple, hll_sketch(dup, "u").collect()))
    assert a == b


def test_hll_merge_by_max_equals_union_sketch(spark):
    """Per-partition / per-snapshot sketches merge with groupBy.max into
    exactly the union's sketch."""
    from ssb_sgis_spark.operators.sketch import hll_sketch

    d1 = spark.range(0, 3000).select(F.concat(F.lit("x"), "id").alias("u"))
    d2 = spark.range(2000, 5000).select(F.concat(F.lit("x"), "id").alias("u"))
    merged = (
        hll_sketch(d1, "u")
        .unionAll(hll_sketch(d2, "u"))
        .groupBy("bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    want = sorted(map(tuple, hll_sketch(d1.unionAll(d2), "u").collect()))
    assert sorted(map(tuple, merged.collect())) == want


def test_hll_estimate_accuracy(spark):
    from ssb_sgis_spark.operators.sketch import hll_estimate, hll_sketch

    for n in (500, 5000, 80000):
        df = spark.range(n).select(F.concat(F.lit("url-"), "id").alias("u"))
        regs = {r.bucket: r.max_rank for r in hll_sketch(df, "u").collect()}
        est = hll_estimate(regs)
        assert abs(est - n) / n < 0.06, (n, est)


# ------------------------------------------------------------- count-min
def test_cms_point_estimates_upper_bound_and_exact_when_sparse(spark):
    from ssb_sgis_spark.operators.sketch import cms_estimate, cms_sketch

    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    sk = [tuple(r) for r in cms_sketch(df, "k").collect()]
    # 3 keys in 4096 columns: no collisions -> exact
    assert cms_estimate(sk, "a") == 50
    assert cms_estimate(sk, "b") == 30
    assert cms_estimate(sk, "c") == 1
    assert cms_estimate(sk, "never-seen") == 0


def test_cms_weighted_matches_groupby_sum(spark):
    from ssb_sgis_spark.operators.sketch import cms_estimate, cms_sketch

    df = spark.range(200).select(
        F.concat(F.lit("s"), F.pmod("id", F.lit(5)).cast("string")).alias("k"),
        (F.col("id") + 1).alias("w"),
    )
    want = {r.k: r.s for r in df.groupBy("k").agg(F.sum("w").alias("s")).collect()}
    sk = [tuple(r) for r in cms_sketch(df, "k", weight_col="w").collect()]
    for k, s in want.items():
        assert cms_estimate(sk, k) == s


def test_cms_merge_by_sum_equals_union_sketch(spark):
    from ssb_sgis_spark.operators.sketch import cms_sketch

    d1 = spark.range(0, 500).select(F.pmod("id", F.lit(9)).cast("string").alias("k"))
    d2 = spark.range(0, 300).select(F.pmod("id", F.lit(4)).cast("string").alias("k"))
    merged = (
        cms_sketch(d1, "k")
        .unionAll(cms_sketch(d2, "k"))
        .groupBy("seed", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    want = sorted(map(tuple, cms_sketch(d1.unionAll(d2), "k").collect()))
    assert sorted(map(tuple, merged.collect())) == want


def test_grouped_hll_equals_per_group_global(spark):
    # the grouped sketch must be EXACTLY the global sketch applied to
    # each group's slice — no cross-group register bleed
    from pyspark.sql import functions as F

    from ssb_sgis_spark.operators.sketch import hll_sketch

    df = spark.range(3000).select(
        (F.col("id") % 3).alias("g"), F.col("id").cast("string").alias("v")
    )
    grouped = {
        (r.g, r.bucket): r.max_rank
        for r in hll_sketch(df, "v", group_cols=["g"]).collect()
    }
    for g in (0, 1, 2):
        solo = {
            (g, r.bucket): r.max_rank
            for r in hll_sketch(df.filter(F.col("g") == g), "v").collect()
        }
        assert {k: v for k, v in grouped.items() if k[0] == g} == solo


def test_grouped_hll_sketches_merge_by_max(spark):
    # per-group sketches built from two disjoint snapshots merge by
    # groupBy(g, bucket).max into exactly the full-data sketch
    from pyspark.sql import functions as F

    from ssb_sgis_spark.operators.sketch import hll_sketch

    df = spark.range(2000).select(
        (F.col("id") % 2).alias("g"), F.col("id").cast("string").alias("v")
    )
    full = hll_sketch(df, "v", group_cols=["g"])
    a = hll_sketch(df.filter(F.col("id") < 1000), "v", group_cols=["g"])
    b = hll_sketch(df.filter(F.col("id") >= 1000), "v", group_cols=["g"])
    merged = (
        a.unionByName(b)
        .groupBy("g", "bucket")
        .agg(F.max("max_rank").cast("long").alias("max_rank"))
    )
    key = lambda rows: {(r.g, r.bucket): r.max_rank for r in rows}
    assert key(merged.collect()) == key(full.collect())
