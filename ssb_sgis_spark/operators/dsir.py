"""DSIR — data selection via importance resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169).

The pretraining-corpus curation step after quality filtering: score
every raw document by how much it *looks like* a target distribution
(e.g. a trusted high-quality slice), so sampling by the score shifts
the corpus toward the target.  DSIR's estimator is deliberately cheap —
two bag-of-hashed-n-grams unigram models and a log-likelihood ratio:

* **features** — every word bigram hashed into ``B = 256`` buckets; the
  bucket is the first two hex chars of ``md5(gram)`` (the same
  cross-engine-stable bucket convention as the HLL sketch,
  ``sketch.py``), so both engines bin identically with no custom hash.
* **models** — bucket histograms with add-one smoothing:
  ``p[b] = (ct[b]+1)/(CT+B)`` over the target slice and
  ``q[b] = (cs[b]+1)/(CS+B)`` over the full corpus.
* **weight** — ``log w(doc) = Σ_grams (ln p[bucket] − ln q[bucket])``,
  kept exact as integer MICRO-nats: each bucket's two logs are floored
  to ``floor(1e6·ln(exact integer ratio))`` ONCE (the ``unigram_nll``
  discipline), so the per-document sum is pure 64-bit integer
  arithmetic and order-free.

Scale shape (10^12 docs): one explode + ONE map-side-combined
``groupBy(bucket)`` builds BOTH models (conditional sums share the
pass); the model is 256 rows, so totals come from an all-rows window
over those 256 rows (bounded, never data-sized) and the per-document
scoring join is a broadcast of 256 λ values against the
``(doc, bucket, count)`` pre-aggregate — the only data-sized shuffles
are the two ``groupBy``s, both combinable.  Documents with no bigrams
keep weight 0 via a left join (exactly one output row per document).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ssb_sgis_spark.functions.text import bigrams_col

__all__ = ["dsir_weights", "dsir_weights_sql"]

N_BUCKETS = 256  # two hex chars of md5


def dsir_weights(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document DSIR importance weight ``(id_col, dsir_micro)`` in
    integer micro-nats — positive means "more like the target slice
    than the corpus average".  ``is_target`` is a boolean column marking
    the target-distribution rows (they stay in the source model too:
    DSIR's q is the raw corpus)."""
    grams = df.select(
        F.col(id_col),
        is_target.alias("_tgt"),
        F.explode(bigrams_col(F.col(text_col))).alias("_g"),
    ).select(
        id_col, "_tgt", F.substring(F.md5("_g"), 1, 2).alias("_b")
    )
    hist = grams.groupBy("_b").agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).cast("long").alias("ct"),
        F.count("*").cast("long").alias("cs"),
    )
    # totals over the 256-row model — an all-rows window on a bounded
    # frame, NOT a data-sized single-partition sort
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    b = F.lit(N_BUCKETS).cast("long")
    lam = hist.select(
        "_b",
        (
            F.floor(
                F.log(
                    (F.col("ct") + 1).cast("double")
                    / (F.sum("ct").over(wall) + b).cast("double")
                )
                * 1e6
            )
            - F.floor(
                F.log(
                    (F.col("cs") + 1).cast("double")
                    / (F.sum("cs").over(wall) + b).cast("double")
                )
                * 1e6
            )
        )
        .cast("long")
        .alias("lam_micro"),
    )
    per_doc = grams.groupBy(id_col, "_b").agg(F.count("*").cast("long").alias("c"))
    scores = (
        per_doc.join(F.broadcast(lam), "_b")
        .groupBy(id_col)
        .agg(F.sum(F.col("c") * F.col("lam_micro")).alias("_s"))
    )
    return df.select(id_col).join(scores, id_col, "left").select(
        id_col, F.coalesce(F.col("_s"), F.lit(0)).cast("long").alias("dsir_micro")
    )


def dsir_weights_sql(
    rel: str,
    is_target_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror: same md5 bucketing, same one-pass conditional
    histogram, same floor-once micro-nat logs, same join + integer sum."""
    n = N_BUCKETS
    return f"""
    WITH g AS (
        SELECT {id_col}, ({is_target_sql}) AS tgt,
               substring(md5(t[i] || ' ' || t[i + 1]), 1, 2) AS b
        FROM (SELECT *, string_split({text_col}, ' ') AS t FROM {rel}),
             unnest(range(1, len(t))) r(i)
    ),
    hist AS (
        SELECT b,
               CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
               CAST(count(*) AS BIGINT) AS cs
        FROM g GROUP BY b
    ),
    tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tct,
                   CAST(sum(cs) AS BIGINT) AS tcs FROM hist),
    lam AS (
        SELECT b,
               CAST(floor(ln(CAST(ct + 1 AS DOUBLE) / CAST(tct + {n} AS DOUBLE)) * 1e6)
                  - floor(ln(CAST(cs + 1 AS DOUBLE) / CAST(tcs + {n} AS DOUBLE)) * 1e6)
               AS BIGINT) AS lam_micro
        FROM hist CROSS JOIN tot
    ),
    pd AS (SELECT {id_col}, b, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY 1, 2),
    sc AS (SELECT pd.{id_col}, CAST(sum(pd.c * lam.lam_micro) AS BIGINT) AS s
           FROM pd JOIN lam USING (b) GROUP BY 1)
    SELECT d.{id_col}, CAST(coalesce(sc.s, 0) AS BIGINT) AS dsir_micro
    FROM {rel} d LEFT JOIN sc ON d.{id_col} = sc.{id_col}
    """
