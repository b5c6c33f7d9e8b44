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
