"""The composed corpus pipeline: quality filter → exact dedup →
benchmark decontamination → sequence packing, as ONE lazy DataFrame DAG.

Each stage is an individually oracle-checked operator (``quality.py``,
``dedup.py``, ``contamination.py``, ``packing.py``); this module wires
them the way a production pretraining-data pipeline actually runs them,
and ships a single end-to-end SQL mirror built from the SAME shared
generators, so the full funnel — not just the stages — is verified
bit-for-bit against DuckDB.

Scale shape of the composition (nothing here adds a stage the parts
didn't already have):
  * quality filter — map-only native CASE, fused into the scan;
  * exact dedup    — one groupBy on ``md5(text)`` whose shuffle carries
    only (hash, id), then a semi-join on id (broadcast when the winner
    set is small);
  * decontamination — map-side n-gram explode + broadcast join against
    the benchmark set; only the (tiny) hit set shuffles; survivors keep
    flowing via an anti-join on id;
  * packing        — the distributed exclusive prefix sum (range buckets
    + parallel windows + broadcast offsets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    distinct_token_count_sql,
    stopword_count_sql,
    token_count_sql,
    word_chars_sql,
)
from .contamination import DEFAULT_N, flag_contamination
from .dedup import shingles_sql
from .packing import pack_sequences, pack_sequences_sql
from .quality import quality_filter, quality_filter_sql

__all__ = ["corpus_pipeline", "corpus_pipeline_sql", "top_bigram_ctes"]


def top_bigram_ctes(rel: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """Per-document top-bigram count via unnest, parametrized by
    relation — the ONE SQL shape shared by the ``rep_stats`` /
    ``quality_filter`` oracles and the pipeline mirror."""
    return f"""toks AS (SELECT {id_col}, string_split({text_col}, ' ') AS t FROM {rel}),
        bg AS (SELECT {id_col}, t[i] || ' ' || t[i+1] AS b
               FROM toks, unnest(range(1, len(t))) AS r(i)),
        cnt AS (SELECT {id_col}, b, count(*) AS c FROM bg GROUP BY {id_col}, b),
        top AS (SELECT {id_col}, max(c) AS m FROM cnt GROUP BY {id_col})"""


def corpus_pipeline(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    ctx_len: int = 2048,
    min_tokens: int = 40,
    max_tokens: int = 100_000,
    contam_n: int = DEFAULT_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    small_input: int = 0,
) -> DataFrame:
    """Run the full funnel and return every SURVIVING document's place
    in the packed training stream (the ``pack_sequences`` schema):
    ``(id, n_tokens, cum_before, seq_first, seq_last, seq_offset,
    n_seqs)``.  A value match on this output certifies all four stages
    at once — a doc wrongly kept or dropped by ANY stage shifts every
    later document's offsets."""
    # 1. quality: map-only keep/drop
    q = (
        quality_filter(corpus, text_col, min_tokens, max_tokens)
        .filter(F.col("quality_pass"))
        .select(id_col, text_col)
    )
    # 2. exact dedup: min id per content hash; only (hash, id) shuffles
    winners = (
        q.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    uq = q.join(winners, id_col, "left_semi")
    # 3. decontamination: drop docs sharing any word n-gram with bench
    flagged = flag_contamination(
        uq, bench, contam_n, id_col=id_col, text_col=text_col
    ).select(id_col)
    clean = uq.join(flagged, id_col, "left_anti")
    # 4. packing: distributed prefix sum over id order
    return pack_sequences(
        clean,
        ctx_len,
        id_col=id_col,
        text_col=text_col,
        small_input=small_input,
    )


def corpus_pipeline_sql(
    corpus_rel: str,
    bench_rel: str,
    *,
    ctx_len: int = 2048,
    min_tokens: int = 40,
    max_tokens: int = 100_000,
    contam_n: int = DEFAULT_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of :func:`corpus_pipeline`, assembled from the same
    shared SQL generators as the per-stage oracles (the quality CASE,
    the shingle shape, the packing window)."""
    case = quality_filter_sql(
        {
            "n_tokens": "n_tokens",
            "word_chars": "word_chars",
            "n_stop": "n_stop",
            "top_bigram": "top_bigram",
            "n_distinct": "n_distinct",
        },
        min_tokens,
        max_tokens,
    )
    sh = shingles_sql(text_col, k=contam_n)
    t = text_col
    clean = f"""(
      WITH corpus AS (SELECT {id_col}, {t} FROM {corpus_rel}),
      {top_bigram_ctes('corpus', id_col, t)},
      sig AS (
          SELECT c.{id_col}, c.{t},
                 {token_count_sql(f'c.{t}')} AS n_tokens,
                 {word_chars_sql(f'c.{t}')} AS word_chars,
                 {stopword_count_sql(f'c.{t}')} AS n_stop,
                 CAST(coalesce(top.m, 0) AS BIGINT) AS top_bigram,
                 {distinct_token_count_sql(f'c.{t}')} AS n_distinct
          FROM corpus c LEFT JOIN top ON top.{id_col} = c.{id_col}
      ),
      q AS (
          SELECT {id_col}, {t} FROM sig WHERE ({case}) IS NULL
      ),
      win AS (
          SELECT min({id_col}) AS {id_col} FROM q GROUP BY md5({t})
      ),
      uq AS (SELECT q.* FROM q SEMI JOIN win USING ({id_col})),
      bgrams AS (
          SELECT DISTINCT unnest({sh}) AS gram FROM {bench_rel}
      ),
      contam AS (
          SELECT DISTINCT {id_col}
          FROM (SELECT {id_col}, unnest({sh}) AS gram FROM uq)
          SEMI JOIN bgrams USING (gram)
      ),
      clean AS (SELECT uq.* FROM uq ANTI JOIN contam USING ({id_col}))
      SELECT {id_col}, {t} FROM clean
    )"""
    return pack_sequences_sql(
        clean, ctx_len, id_col=id_col, tokens_expr=token_count_sql(t)
    )
