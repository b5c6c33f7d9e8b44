"""Exact order statistics without a global sort.

``approx_percentile`` is built in, but corpus curation decisions (length
cutoffs, quality-score thresholds, budget caps) are often made from
EXACT quantiles — and a naive ``ORDER BY`` + offset pull is a
single-partition sort at 10^12 rows.  This operator computes exact
discrete quantiles from the VALUE HISTOGRAM instead:

1. ``groupBy(value).count()`` — one shuffle with map-side combine; the
   histogram's row count is the column's distinct cardinality, which for
   the columns this is used on (token counts, byte lengths, integer
   scores) is orders of magnitude below the corpus;
2. a cumulative count over the histogram via the same range-bucketed
   distributed prefix sum the sequence packer uses
   (`operators/packing.exclusive_prefix_sum` — parallel windows +
   broadcast bucket offsets, no single-partition sort at scale);
3. one conditional-min aggregate picks every requested quantile in a
   single pass: ``q_p = min(v : cum_count(v) >= ceil(p/1000 * N))``.

Quantile definition (lower discrete quantile): the smallest value whose
cumulative count reaches ``ceil(p * N / 1000)`` (clamped to rank 1), so
``p = 0`` is the min, ``p = 1000`` the max, and ``p = 500`` the lower
median.  Everything after the histogram is 64-bit integer arithmetic —
the DuckDB mirror is bit-identical by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PERMILLES = (0, 250, 500, 750, 900, 990, 1000)


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    permilles: Sequence[int] = DEFAULT_PERMILLES,
    small_input: int | None = None,
) -> DataFrame:
    """Exact quantiles of ``value_col`` → ``(p_permille, value)`` rows,
    one per requested permille, both BIGINT.  ``small_input`` forwards
    to the prefix sum's single-window cutoff (tests force the bucketed
    distributed path with a tiny value)."""
    from .packing import _SMALL_INPUT, exclusive_prefix_sum

    ps = [int(p) for p in permilles]
    hist = df.groupBy(F.col(value_col).alias("_v")).agg(
        F.count("*").cast("long").alias("_c")
    )
    cum = exclusive_prefix_sum(
        hist,
        "_v",
        "_c",
        "_before",
        small_input=_SMALL_INPUT if small_input is None else int(small_input),
    ).withColumn(
        "_cum", F.col("_before") + F.col("_c")
    )
    tot = hist.agg(F.sum("_c").cast("long").alias("_n"))

    def _target(p: int):
        return F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"({p} * _n + 999) div 1000"),
        )

    aggd = cum.crossJoin(F.broadcast(tot)).agg(
        *[
            F.min(F.when(F.col("_cum") >= _target(p), F.col("_v"))).alias(f"_q{p}")
            for p in ps
        ]
    )
    return aggd.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).cast("long").alias("p_permille"),
                        F.col(f"_q{p}").cast("long").alias("value"),
                    )
                    for p in ps
                ]
            )
        ).alias("_s")
    ).select("_s.p_permille", "_s.value")


def exact_quantiles_sql(
    rel: str,
    value_col: str,
    permilles: Sequence[int] = DEFAULT_PERMILLES,
) -> str:
    """DuckDB mirror: same histogram → cumulative window → conditional
    mins, unpivoted with UNION ALL."""
    ps = [int(p) for p in permilles]
    mins = ",\n               ".join(
        f"min(CASE WHEN cum >= greatest(1, ({p} * n + 999) // 1000)"
        f" THEN v END) AS q{p}"
        for p in ps
    )
    unions = "\n    UNION ALL ".join(
        f"SELECT CAST({p} AS BIGINT) AS p_permille,"
        f" CAST(q{p} AS BIGINT) AS value FROM a"
        for p in ps
    )
    return f"""
    WITH hist AS (
        SELECT {value_col} AS v, CAST(count(*) AS BIGINT) AS c
        FROM {rel} GROUP BY {value_col}
    ),
    cum AS (
        SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
        FROM hist
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM hist),
    a AS (
        SELECT {mins}
        FROM cum CROSS JOIN tot
    )
    {unions}
    """
