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

from .dedup import shingles_col, shingles_sql

DEFAULT_N = 8


def word_ngrams_col(text: Column, n: int = DEFAULT_N) -> Column:
    """DISTINCT space-joined word ``n``-grams of ``text`` as an array.

    One tokenization shape for the whole pipeline: this is dedup's
    shingle construction (``dedup.shingles_col``) at a different k, so a
    tokenization fix there cannot silently diverge decontamination.
    Distinct-per-document is semantically free here — every consumer
    (the benchmark gram set, the DISTINCT hit count) dedups anyway, and
    it shrinks the map-side explode."""
    return shingles_col(text, k=n)


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
    """DuckDB mirror of :func:`flag_contamination`, built from the same
    shared n-gram SQL shape as the dedup oracles (``dedup.shingles_sql``)
    so the two mirrors cannot drift apart."""
    sh = shingles_sql(text_col, k=n)
    return f"""
    WITH bgrams AS (
      SELECT DISTINCT unnest({sh}) AS gram FROM {bench_rel}
    ),
    cgrams AS (
      SELECT {id_col}, unnest({sh}) AS gram FROM {corpus_rel}
    )
    SELECT {id_col}, CAST(count(DISTINCT gram) AS BIGINT) AS n_hits
    FROM cgrams JOIN bgrams USING (gram)
    GROUP BY {id_col}
    """
