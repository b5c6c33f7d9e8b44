"""Benchmark-contamination detection: flag corpus documents that share a
word n-gram with a (small) benchmark/eval set.

The standard decontamination step of an LLM training-data pipeline
(n-gram overlap, as used for GPT-3/PaLM-style dedup-vs-eval): any
training document containing a verbatim ``n``-gram from a benchmark
document is flagged (with its overlap count) so it can be dropped or
audited before training.

Scale shape at 10^12 docs:
* the benchmark side is tiny (eval suites are thousands of documents) —
  its distinct n-gram set builds once and BROADCASTS;
* the corpus side explodes to n-grams MAP-SIDE (no shuffle: explode is
  a generator inside the scan stage) and probes the broadcast hash set;
* the only shuffle keys are the *contaminated* documents (the groupBy
  after the inner join), a vanishing fraction of the corpus.

Everything is native Spark expressions (split / transform / slice /
explode) with a DuckDB mirror — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_N = 8


def word_ngrams_col(text: Column, n: int = DEFAULT_N) -> Column:
    """All space-joined word ``n``-grams of ``text`` as an array column.

    Guarded for short documents: Spark's ``sequence(1, cnt)`` DESCENDS
    when cnt < 1 (step defaults to -1), so the empty case must be
    explicit, not relied on."""
    toks = F.split(text, " ")
    cnt = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(cnt >= 1, grams).otherwise(F.array().cast("array<string>"))


def benchmark_ngram_set(
    bench: DataFrame, n: int = DEFAULT_N, text_col: str = "text"
) -> DataFrame:
    """Distinct n-grams of the benchmark set — the broadcast dimension."""
    return (
        bench.select(F.explode(word_ngrams_col(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def flag_contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = DEFAULT_N,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_hits) for every corpus document sharing >= 1 word n-gram
    with the benchmark set; ``n_hits`` counts DISTINCT shared n-grams.

    Plan: scan -> map-side n-gram explode -> broadcast hash join against
    the benchmark n-gram set -> groupBy over the (small) hit set."""
    grams = docs.select(
        F.col(id_col),
        F.explode(word_ngrams_col(F.col(text_col), n)).alias("gram"),
    )
    hits = grams.join(F.broadcast(benchmark_ngram_set(bench, n, text_col)), "gram")
    return hits.groupBy(id_col).agg(
        F.count_distinct(F.col("gram")).alias("n_hits")
    )


def contamination_sql(
    corpus_rel: str,
    bench_rel: str,
    n: int = DEFAULT_N,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of :func:`flag_contamination` (1-based inclusive
    list_slice == Spark's slice(toks, i, n))."""
    m = n - 1
    return f"""
    WITH bt AS (SELECT string_split({text_col}, ' ') AS toks FROM {bench_rel}),
    bgrams AS (
      SELECT DISTINCT array_to_string(list_slice(toks, i, i + {m}), ' ') AS gram
      FROM bt, LATERAL UNNEST(generate_series(1, greatest(len(toks) - {m}, 0))) AS u(i)
    ),
    ct AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS toks FROM {corpus_rel}
    ),
    cgrams AS (
      SELECT {id_col}, array_to_string(list_slice(toks, i, i + {m}), ' ') AS gram
      FROM ct, LATERAL UNNEST(generate_series(1, greatest(len(toks) - {m}, 0))) AS u(i)
    )
    SELECT {id_col}, CAST(count(DISTINCT gram) AS BIGINT) AS n_hits
    FROM cgrams JOIN bgrams USING (gram)
    GROUP BY {id_col}
    """
