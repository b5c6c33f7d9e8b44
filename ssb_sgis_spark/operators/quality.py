"""Gopher-style document quality filtering as one composed, map-only rule.

The per-signal columns (token counts, stopword hits, repetition,
distinctness — functions/text.py) are each oracle-checked individually by
the ``doc_stats`` / ``rep_stats`` driver queries; this operator composes
them into the keep/drop decision an LLM-corpus pipeline actually applies
(Gopher §A.1-style heuristics), tagging every dropped document with the
FIRST failing rule so curation is auditable.

Scale shape: pure native column expressions over one scan — no shuffle,
no Python, whole-stage codegen.  At 10^12 documents this is the cheapest
possible pass (the signals fold into the same projection).

Exactness: every threshold compare uses integer cross-multiplication
(``stopwords * 50 < tokens`` instead of ``stopwords/tokens < 0.02``), so
the Spark plan and the DuckDB mirror agree bit-for-bit with no float
division anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    distinct_token_count_col,
    stopword_count_col,
    token_count_col,
    top_bigram_count_col,
    word_chars_col,
)

__all__ = ["quality_filter", "quality_filter_sql", "QUALITY_RULES"]

# (rule name, spark condition builder, sql condition builder) — a doc FAILS
# a rule when the condition is true; fail_reason = first failing rule in
# THIS order (mirrored verbatim in the SQL CASE).
QUALITY_RULES = (
    # fewer than `min_tokens` words (Gopher drops <50-word docs)
    ("too_short", lambda s, p: s["n_tokens"] < p["min_tokens"],
     lambda q, p: f"{q['n_tokens']} < {p['min_tokens']}"),
    ("too_long", lambda s, p: s["n_tokens"] > p["max_tokens"],
     lambda q, p: f"{q['n_tokens']} > {p['max_tokens']}"),
    # mean word length outside [3, 12] chars: word_chars (separator spaces
    # excluded — length(text) would shift the bounds by ~1) < 3*tokens or
    # > 12*tokens
    ("word_length", lambda s, p: (s["word_chars"] < 3 * s["n_tokens"])
     | (s["word_chars"] > 12 * s["n_tokens"]),
     lambda q, p: f"({q['word_chars']} < 3 * {q['n_tokens']} OR {q['word_chars']} > 12 * {q['n_tokens']})"),
    # stopword ratio < 2%: stopwords * 50 < tokens
    ("low_stopword", lambda s, p: s["n_stop"] * 50 < s["n_tokens"],
     lambda q, p: f"{q['n_stop']} * 50 < {q['n_tokens']}"),
    # top bigram covers > 20% of the document: top_bigram * 5 > tokens
    ("repetitive", lambda s, p: s["top_bigram"] * 5 > s["n_tokens"],
     lambda q, p: f"{q['top_bigram']} * 5 > {q['n_tokens']}"),
    # distinct-token ratio < 20%: distinct * 5 < tokens
    ("low_diversity", lambda s, p: s["n_distinct"] * 5 < s["n_tokens"],
     lambda q, p: f"{q['n_distinct']} * 5 < {q['n_tokens']}"),
)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 40,
    max_tokens: int = 100_000,
) -> DataFrame:
    """Append ``quality_pass`` (boolean) and ``fail_reason`` (first
    failing rule name, NULL when the document passes)."""
    t = F.col(text_col)
    signals = {
        "n_tokens": token_count_col(t),
        "word_chars": word_chars_col(t),
        "n_stop": stopword_count_col(t),
        "top_bigram": top_bigram_count_col(t),
        "n_distinct": distinct_token_count_col(t),
    }
    params = {"min_tokens": min_tokens, "max_tokens": max_tokens}
    reason = F.lit(None).cast("string")
    for name, cond, _sql in reversed(QUALITY_RULES):
        reason = F.when(cond(signals, params), F.lit(name)).otherwise(reason)
    return df.withColumn("fail_reason", reason).withColumn(
        "quality_pass", F.col("fail_reason").isNull()
    )


def quality_filter_sql(
    q: dict[str, str], min_tokens: int = 40, max_tokens: int = 100_000
) -> str:
    """DuckDB mirror: the ``fail_reason`` CASE expression (same rule
    order, same integer arithmetic).  ``q`` maps the signal names
    ``n_tokens / word_chars / n_stop / top_bigram / n_distinct`` to SQL
    expressions or CTE column names (the top-bigram count has no scalar
    SQL form — DuckDB computes it with an unnest CTE, see the
    ``rep_stats`` oracle — so the caller names the column).  Wrap in a
    SELECT that also derives ``quality_pass = fail_reason IS NULL``."""
    params = {"min_tokens": min_tokens, "max_tokens": max_tokens}
    whens = "\n".join(
        f"WHEN {sql(q, params)} THEN '{name}'" for name, _c, sql in QUALITY_RULES
    )
    return f"CASE {whens} ELSE NULL END"


# ----------------------------------------------- unigram LM quality score
def unigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-trained unigram language-model score per document — the
    CCNet-style "LM perplexity" quality signal, with the LM being the
    corpus's own unigram distribution (no external model, fully
    distributed training + scoring in one DAG).

    Returns ``(id_col, nll_micro, n_tok)`` where ``nll_micro`` is the
    document's total negative log-likelihood in integer MICRO-NATS
    (``sum(c_dt * floor(-ln(c_t / T) * 1e6))``).  The per-token
    ``-ln p`` is computed ONCE per vocabulary entry and floored to
    micro-nats BEFORE the weighted sum, so the aggregate is pure 64-bit
    integer arithmetic: order-independent and bit-identical to the SQL
    mirror (a float sum would depend on Spark's nondeterministic
    partial-agg order).  Known tolerance: cross-engine exactness of the
    per-entry floor assumes Java ``Math.log`` and the mirror libm's
    ``ln`` agree on the same double input to well under 0.5 micro-nats
    absolute — true in practice (both are sub-ulp-accurate); a 1-ulp
    disagreement flips an entry only when ``-ln(p)*1e6`` falls within
    ~1e-9 of an integer (~1e-9 per entry, so ~0.1 expected flips even
    at a 10^8-entry web vocab).  Each engine alone is fully
    deterministic regardless.  Downstream filtering stays exact via integer
    cross-multiplication: ``nll_micro < thr_micro * n_tok``.

    Scale shape:
    * vocab = one groupBy(token) with map-side combine over the
      exploded tokens (hot tokens like "the" are partial-aggregated,
      never gathered);
    * per-doc term counts = one groupBy(id, token) — also map-side
      combined, so the join input is distinct (doc, token) pairs, not
      raw token occurrences;
    * score join is an equi-join on token (AQE handles residual skew;
      the vocab side is NOT assumed broadcastable — web-scale vocab is
      O(10^8) rows), then one groupBy(id) integer sum.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    doc_tok = toks.groupBy(id_col, "tok").agg(F.count("*").alias("c_dt"))
    # vocab re-aggregates doc_tok (Σ c_dt ≡ raw token count), so the
    # doc_tok shuffle exchange is REUSED (ReuseExchange) and the corpus
    # is scanned + exploded once, not twice
    vocab = doc_tok.groupBy("tok").agg(F.sum("c_dt").alias("c_t"))
    total = vocab.agg(F.sum("c_t").alias("T"))
    vocab = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        F.floor(-F.log(F.col("c_t") / F.col("T")) * 1e6)
        .cast("long")
        .alias("nll_tok_micro"),
    )
    # the score join is pinned to a SHUFFLE-HASH join BUILT FROM THE
    # VOCAB side: without the hint Spark's aggregate-size estimate can
    # pick BuildLeft and try to broadcast the (huge) doc-term side —
    # measured as a driver OOM at executor-sized heaps.  Shuffle-hash is
    # also the right strategy at web scale (10^8-row vocab): no sort,
    # vocab arrives pre-partitioned on tok from its own groupBy, and
    # each partition builds only its vocab slice.
    return (
        doc_tok.join(vocab.hint("shuffle_hash"), "tok")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("c_dt") * F.col("nll_tok_micro")).alias("nll_micro"),
            F.sum("c_dt").alias("n_tok"),
        )
    )


def unigram_nll_sql(
    rel: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB mirror: same micro-nat flooring before the integer sum."""
    return f"""
    WITH toks AS (
        SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS tok
        FROM {rel}
    ),
    doc_tok AS (
        SELECT {id_col}, tok, count(*) AS c_dt FROM toks GROUP BY 1, 2
    ),
    vocab AS (
        SELECT tok, sum(c_dt) AS c_t FROM doc_tok GROUP BY 1
    ),
    tot AS (SELECT sum(c_t) AS T FROM vocab),
    scored AS (
        SELECT tok,
               CAST(floor(-ln(c_t / T) * 1e6) AS BIGINT) AS nll_tok_micro
        FROM vocab, tot
    )
    SELECT d.{id_col},
           CAST(sum(d.c_dt * s.nll_tok_micro) AS BIGINT) AS nll_micro,
           CAST(sum(d.c_dt) AS BIGINT) AS n_tok
    FROM doc_tok d JOIN scored s USING (tok)
    GROUP BY d.{id_col}
    """
