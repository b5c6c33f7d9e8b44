"""Overlapping token-window chunking (RAG / embedding-corpus prep).

Splits each document into fixed-size token windows with overlap — the
standard retrieval-corpus transform (chunk for embedding, keep overlap
so no answer span straddles a boundary unseen).  Part of the
LLM-pipeline layer beyond the reference (sgis has no text ops).

Window rule (exact, mirrored in SQL): tokens are the engine-wide
single-space split (:mod:`..functions.text` convention); with chunk size
``C`` and overlap ``V`` (stride ``S = C - V``), starts are ``0, S, 2S,
...`` and the number of windows is ``1`` when ``n <= C`` else
``1 + ceil((n - C) / S)`` — i.e. the last window is the first one whose
end reaches the document end, so no window is a strict suffix-subset of
its predecessor and every token is covered.

Scale shape (10^12 docs): one map-only projection — split, a
``sequence``/``posexplode`` over the per-doc window count, ``slice`` +
``array_join`` per window.  No shuffle anywhere; output rows ≈ input
tokens / S.  Catalyst prunes ``text`` after the projection so only chunk
rows flow downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text) -> (id, chunk_id, n_tokens, chunk_text) overlapping
    token windows.  ``chunk_id`` is 0-based window index per document."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens (got {overlap} / {chunk_tokens})"
        )
    c, s = int(chunk_tokens), int(chunk_tokens - overlap)
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_windows = F.when(n <= c, F.lit(1)).otherwise(
        F.lit(1) + F.floor((n - c + s - 1) / s).cast("int")
    )
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        n.alias("_n"),
        F.posexplode(F.sequence(F.lit(0), n_windows - 1)).alias("chunk_id", "_w"),
    )
    start = F.col("_w") * s
    return base.select(
        id_col,
        F.col("chunk_id"),
        F.least(F.lit(c), F.col("_n") - start).cast("long").alias("n_tokens"),
        F.array_join(F.slice("_toks", start + 1, c), " ").alias("chunk_text"),
    )


def chunk_oracle_sql(
    rel: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of the exact window rule."""
    c, s = int(chunk_tokens), int(chunk_tokens - overlap)
    return f"""
        WITH t AS (
          SELECT {id_col}, string_split({text_col}, ' ') AS toks,
                 len(string_split({text_col}, ' ')) AS n
          FROM {rel}
        ),
        w AS (
          SELECT {id_col}, toks, n,
                 CASE WHEN n <= {c} THEN 1
                      ELSE 1 + (n - {c} + {s} - 1) // {s} END AS nw
          FROM t
        )
        SELECT {id_col},
               CAST(i AS INTEGER) AS chunk_id,
               CAST(least({c}, n - i * {s}) AS BIGINT) AS n_tokens,
               array_to_string(toks[i * {s} + 1 : i * {s} + {c}], ' ') AS chunk_text
        FROM w, unnest(range(nw)) AS r(i)
    """
