"""Documents corpus + deterministic duplicate injection.

The driver's ``documents`` table has no natural duplicates, so the dedup
operators are exercised on a corpus with injected copies:

* exact copies  — doc_id + 1_000_000, identical text
* near copies   — doc_id + 2_000_000, last 3 tokens dropped

Both derivations are closed-form (Spark columns ≡ DuckDB SQL), so every
dedup query stays oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXACT_OFFSET = 1_000_000
NEAR_OFFSET = 2_000_000
NEAR_DROP = 3  # tokens dropped from the tail of near-dup copies


def docs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def docs_with_dups_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs_df(spark, sf_dir).select("doc_id", "text")
    exact = d.select(
        (F.col("doc_id") + EXACT_OFFSET).alias("doc_id"), F.col("text")
    )
    toks = F.split(F.col("text"), " ")
    near = d.select(
        (F.col("doc_id") + NEAR_OFFSET).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, F.size(toks) - NEAR_DROP)).alias("text"),
    )
    return d.unionByName(exact).unionByName(near)


def docs_with_dups_sql(rel: str = "documents") -> str:
    toks = "string_split(text, ' ')"
    return f"""
    SELECT doc_id, text FROM {rel}
    UNION ALL
    SELECT doc_id + {EXACT_OFFSET} AS doc_id, text FROM {rel}
    UNION ALL
    SELECT doc_id + {NEAR_OFFSET} AS doc_id,
           array_to_string(list_slice({toks}, 1, len({toks}) - {NEAR_DROP}), ' ') AS text
    FROM {rel}
    """
