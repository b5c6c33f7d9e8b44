"""Exact distributed quantiles: rank-definition checks vs numpy and the
distributed-path invariant behind the `quantiles` oracle query."""

import numpy as np
from pyspark.sql import functions as F


def _expected(vals, p_permille):
    s = np.sort(np.asarray(vals))
    n = len(s)
    tgt = max(1, -(-p_permille * n // 1000))  # ceil(p*n/1000), clamped
    return int(s[tgt - 1])


def test_exact_quantiles_matches_rank_definition(spark):
    from ssb_sgis_spark.operators.stats import exact_quantiles

    vals = [((i * 37) % 101) for i in range(500)] + [7] * 40  # ties too
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    ps = (0, 100, 500, 900, 999, 1000)
    out = {
        r.p_permille: r.value
        for r in exact_quantiles(df, "x", ps).collect()
    }
    for p in ps:
        assert out[p] == _expected(vals, p), p
    assert out[0] == min(vals) and out[1000] == max(vals)


def test_exact_quantiles_distributed_prefix_path(spark):
    """Force the bucketed prefix-sum path via the small_input cutoff and
    check the quantiles of a many-distinct-values column still match."""
    from ssb_sgis_spark.operators.stats import exact_quantiles

    vals = [int(v) for v in ((np.arange(2000) * 997) % 4999)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    out = {
        r.p_permille: r.value
        for r in exact_quantiles(df, "x", (250, 750), small_input=10).collect()
    }
    assert out[250] == _expected(vals, 250)
    assert out[750] == _expected(vals, 750)


def test_exact_quantiles_duckdb_parity(spark):
    import duckdb
    import pandas as pd

    from ssb_sgis_spark.operators.stats import (
        exact_quantiles,
        exact_quantiles_sql,
    )

    vals = [((i * i) % 313) for i in range(700)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    res = (
        exact_quantiles(df, "x")
        .toPandas()
        .sort_values("p_permille")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({v})" for v in vals)
        + ") v(x)"
    )
    ora = (
        con.execute(exact_quantiles_sql("t", "x"))
        .df()
        .sort_values("p_permille")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(res.astype("int64"), ora.astype("int64"))
