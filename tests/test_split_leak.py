"""Train/eval near-dup leakage check (q_split_leak composition)."""

import hashlib

from pyspark.sql import functions as F

from ssb_sgis_spark.operators.sampling import fraction_threshold_hex


def _is_train(doc_id, frac=0.8, seed="7"):
    h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:8]
    return h < fraction_threshold_hex(frac)


def test_leaking_groups_detected(spark):
    # exact duplicate pairs with ids chosen to straddle the hash split;
    # each group gets a DISJOINT token set so only intra-group Jaccard
    # crosses the threshold
    def text(gi):
        return " ".join(f"tok{gi}_{j}" for j in range(12))

    pairs = []
    a = None
    for i in range(200):
        if a is None:
            a = i
        elif _is_train(a) != _is_train(i):
            pairs.append((a, i))
            a = None
        elif len(pairs) < 3:
            a = i
    assert len(pairs) >= 3
    rows = []
    for gi, (x, y) in enumerate(pairs[:3]):
        rows += [(x, text(gi)), (y, text(gi))]
    # plus a same-side pair that must NOT leak
    same = [i for i in range(300, 400) if _is_train(i)][:2]
    rows += [(same[0], text(99)), (same[1], text(99))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    from ssb_sgis_spark.operators.dedup import minhash_dup_groups

    groups = minhash_dup_groups(df)
    thr = fraction_threshold_hex(0.8)
    tr = (
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":7"))), 1, 8
        )
        < thr
    ).cast("long")
    leak = (
        groups.select("grp", tr.alias("t"))
        .groupBy("grp")
        .agg(F.sum("t").alias("n_train"), (F.count(F.lit(1)) - F.sum("t")).alias("n_eval"))
        .filter((F.col("n_train") > 0) & (F.col("n_eval") > 0))
    )
    got = {r.grp for r in leak.collect()}
    expected = {min(x, y) for x, y in pairs[:3]}
    assert got == expected  # the same-side group is absent
