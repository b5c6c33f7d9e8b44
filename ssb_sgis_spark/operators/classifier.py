"""Distributed quality/language classifier: integer-exact batch
perceptron over hashed bag-of-words features.

The fastText-style linear classifier is the workhorse of LLM-corpus
curation (CCNet's language filter, LLaMA's "looks-like-references"
quality model): hash tokens into B buckets, train a linear model, score
every page.  This module trains one ON the cluster with arithmetic a
DuckDB oracle can replay bit-for-bit:

* **features** — token unigrams hashed to ``B = 256`` buckets (first
  two hex chars of ``md5(token)`` — the engine-wide cross-engine bucket
  convention shared with DSIR/HLL), counts as the feature value, plus a
  constant bias feature; one explode + one combinable groupBy, computed
  ONCE and checkpointed for all rounds.
* **training** — the BATCH perceptron: per round, score every doc
  (``s = Σ w[b]·x[b]``), collect the misclassified set
  (``sign(s) ≠ y`` with ``sign(0) = -1``), and add
  ``Σ_misclassified y·x`` to the weights.  Every quantity is a 64-bit
  integer — no learning rate, no floats, no order dependence — so
  ``n_iter`` Spark rounds equal ``n_iter`` unrolled SQL CTE rounds
  exactly.
* **scale shape** — per round: weights (≤ 257 rows) broadcast into the
  feature join, one combinable ``groupBy(doc)`` for scores, one
  combinable ``groupBy(bucket)`` for the gradient.  The only data-sized
  shuffles are those two aggregations; text is left behind at the
  feature stage.  The weight state itself never exceeds B+1 rows.

Batch (not online) updates are what make this distributed-exact: the
classic per-sample perceptron is order-dependent and unparallelizable;
summing the misclassified gradient per round is the standard
data-parallel form and keeps the oracle deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["perceptron_scores", "perceptron_oracle_sql"]

BIAS = "__b"  # bias pseudo-bucket (md5 hex buckets are [0-9a-f]{2})


def _features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("_t")
    )
    counted = (
        toks.select(id_col, F.substring(F.md5("_t"), 1, 2).alias("b"))
        .groupBy(id_col, "b")
        .agg(F.count("*").cast("long").alias("x"))
    )
    bias = df.select(
        F.col(id_col), F.lit(BIAS).alias("b"), F.lit(1).cast("long").alias("x")
    )
    return counted.unionByName(bias)


def perceptron_scores(
    df: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_iter: int = 3,
) -> DataFrame:
    """Train ``n_iter`` batch-perceptron rounds on ``label`` (+1/-1
    integer column) and score every document with the final weights:
    ``(id_col, y, score, pred)``.  Deterministic and integer-exact."""
    feats = _features(df, id_col, text_col).localCheckpoint(eager=True)
    labels = df.select(F.col(id_col), label.cast("long").alias("y"))

    weights = None  # bucket -> w; None means all-zero round 1
    for _ in range(n_iter):
        if weights is None:
            scores = labels.select(id_col, F.lit(0).cast("long").alias("s"))
        else:
            scores = (
                feats.join(F.broadcast(weights), on="b")
                .groupBy(id_col)
                .agg(F.sum(F.col("x") * F.col("w")).alias("s"))
                .join(labels.select(id_col), on=id_col, how="right")
                .fillna({"s": 0})
            )
        pred = F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(-1))
        mis = (
            labels.join(scores, on=id_col)
            .filter(pred != F.col("y"))
            .select(id_col, "y")
        )
        delta = (
            feats.join(mis, on=id_col)
            .groupBy("b")
            .agg(F.sum(F.col("y") * F.col("x")).alias("d"))
        )
        if weights is None:
            weights = delta.select("b", F.col("d").alias("w"))
        else:
            weights = (
                weights.join(delta, on="b", how="full_outer")
                .select(
                    "b",
                    (
                        F.coalesce("w", F.lit(0)) + F.coalesce("d", F.lit(0))
                    ).alias("w"),
                )
            )
        weights = weights.localCheckpoint(eager=True)  # ≤ 257 rows

    final = (
        feats.join(F.broadcast(weights), on="b")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("w")).cast("long").alias("score"))
        .join(labels, on=id_col, how="right")
        .fillna({"score": 0})
    )
    return final.select(
        id_col,
        "y",
        "score",
        F.when(F.col("score") > 0, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("pred"),
    )


def perceptron_oracle_sql(
    rel: str,
    label_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_iter: int = 3,
) -> str:
    """DuckDB mirror: ``n_iter`` unrolled rounds of the identical batch
    rule.  ``label_sql`` is a +1/-1 integer expression over ``rel``."""
    rounds = []
    for r in range(1, n_iter + 1):
        prev_w = f"w{r - 1}"
        if r == 1:
            score = f"s1 AS (SELECT {id_col}, CAST(0 AS BIGINT) AS s FROM l)"
        else:
            score = f"""
        s{r} AS (
          SELECT l.{id_col}, coalesce(sc.s, 0) AS s
          FROM l LEFT JOIN (
            SELECT f.{id_col}, sum(f.x * w.w) AS s
            FROM f JOIN {prev_w} w ON f.b = w.b
            GROUP BY f.{id_col}
          ) sc ON l.{id_col} = sc.{id_col}
        )"""
        mis = f"""
        m{r} AS (
          SELECT l.{id_col}, l.y
          FROM l JOIN s{r} USING ({id_col})
          WHERE (CASE WHEN s{r}.s > 0 THEN 1 ELSE -1 END) <> l.y
        ),
        d{r} AS (
          SELECT f.b, sum(f.y_x) AS d
          FROM (SELECT f.b, f.{id_col}, m.y * f.x AS y_x
                FROM f JOIN m{r} m USING ({id_col})) f
          GROUP BY f.b
        )"""
        if r == 1:
            neww = f"w1 AS (SELECT b, d AS w FROM d1)"
        else:
            neww = f"""
        w{r} AS (
          SELECT coalesce(w.b, d.b) AS b,
                 coalesce(w.w, 0) + coalesce(d.d, 0) AS w
          FROM {prev_w} w FULL OUTER JOIN d{r} d ON w.b = d.b
        )"""
        rounds.append(f"{score},\n{mis},\n{neww}")
    return f"""
        WITH toks AS (
          SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS t
          FROM {rel}
        ),
        f AS (
          SELECT {id_col}, substr(md5(t), 1, 2) AS b,
                 CAST(count(*) AS BIGINT) AS x
          FROM toks GROUP BY {id_col}, b
          UNION ALL
          SELECT {id_col}, '{BIAS}' AS b, CAST(1 AS BIGINT) AS x FROM {rel}
        ),
        l AS (
          SELECT {id_col}, CAST({label_sql} AS BIGINT) AS y FROM {rel}
        ),
        {",".join(rounds)}
        SELECT l.{id_col}, l.y,
               CAST(coalesce(sc.s, 0) AS BIGINT) AS score,
               CAST(CASE WHEN coalesce(sc.s, 0) > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred
        FROM l LEFT JOIN (
          SELECT f.{id_col}, sum(f.x * w.w) AS s
          FROM f JOIN w{n_iter} w ON f.b = w.b
          GROUP BY f.{id_col}
        ) sc ON l.{id_col} = sc.{id_col}
    """
