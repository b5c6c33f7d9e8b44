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

__all__ = [
    "quality_filter",
    "quality_filter_sql",
    "QUALITY_RULES",
    "unigram_nll",
    "unigram_nll_sql",
    "bigram_nll",
    "bigram_nll_sql",
    "nll_buckets",
    "nll_buckets_sql",
]

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


# --------------------------------------------- CCNet perplexity buckets
def nll_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style head/middle/tail perplexity bucketing: score every
    document with the corpus-trained unigram LM (:func:`unigram_nll`),
    then split the corpus into thirds by per-token score — ``head`` is
    the most-fluent third (lowest mean NLL), ``tail`` the least.  CCNet
    (Wenzek et al. 2020) uses exactly this head/middle/tail split to
    stage-gate web text into LM training mixes.

    Returns ``(id_col, nll_mean_micro, bucket)``.  ``nll_mean_micro`` is
    the integer per-token mean ``nll_micro div n_tok`` (micro-nats) —
    kept integer so the tercile thresholds (exact 333/667-permille
    quantiles from the value histogram, :func:`~.stats.exact_quantiles`)
    and the bucket compares are pure 64-bit arithmetic, bit-identical to
    the SQL mirror.  ``n_tok >= 1`` always (splitting "" yields one empty
    token), so the division is total.

    Scale shape: the unigram score DAG (two shrinking aggs + pinned
    shuffle-hash join) feeds BOTH the threshold histogram and the final
    labeling; the histogram side collapses to distinct-mean-value rows
    (tiny — bounded by the distinct integer means), the thresholds come
    back as a ONE-row broadcast, and labeling is map-only.  At 10^12
    docs persist the scored frame before calling if the upstream scan is
    expensive — the two branches otherwise recompute it (the exchanges
    dedupe under ReuseExchange within this one plan, so in practice the
    corpus is exploded once).
    """
    from .stats import exact_quantiles

    scored = unigram_nll(df, id_col, text_col).withColumn(
        "nll_mean_micro", F.expr("nll_micro div n_tok")
    )
    q = exact_quantiles(scored, "nll_mean_micro", (333, 667))
    thr = q.agg(
        F.min(F.when(F.col("p_permille") == 333, F.col("value"))).alias("q33"),
        F.min(F.when(F.col("p_permille") == 667, F.col("value"))).alias("q67"),
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        id_col,
        "nll_mean_micro",
        F.when(F.col("nll_mean_micro") <= F.col("q33"), F.lit("head"))
        .when(F.col("nll_mean_micro") <= F.col("q67"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def nll_buckets_sql(rel: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB mirror: same integer mean, same histogram-quantile
    thresholds (lower discrete quantile at 333/667 permille), same CASE."""
    return f"""
    WITH scored AS (
        SELECT {id_col}, CAST(nll_micro // n_tok AS BIGINT) AS nll_mean_micro
        FROM ({unigram_nll_sql(rel, id_col, text_col)})
    ),
    hist AS (
        SELECT nll_mean_micro AS v, CAST(count(*) AS BIGINT) AS c
        FROM scored GROUP BY 1
    ),
    cum AS (
        SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
        FROM hist
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM hist),
    thr AS (
        SELECT min(CASE WHEN cum >= greatest(1, (333 * n + 999) // 1000)
                   THEN v END) AS q33,
               min(CASE WHEN cum >= greatest(1, (667 * n + 999) // 1000)
                   THEN v END) AS q67
        FROM cum CROSS JOIN tot
    )
    SELECT s.{id_col}, s.nll_mean_micro,
           CASE WHEN s.nll_mean_micro <= t.q33 THEN 'head'
                WHEN s.nll_mean_micro <= t.q67 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored s CROSS JOIN thr t
    """


# ------------------------------------------ interpolated bigram LM score
def bigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-trained INTERPOLATED BIGRAM language-model score per doc —
    the next rung above :func:`unigram_nll` on the CCNet/KenLM quality
    ladder: fluency is judged on word TRANSITIONS, not just word choice,
    so keyword-stuffed spam (plausible unigrams, implausible sequences)
    separates from prose.

    Model: Jelinek-Mercer interpolation with exact rational weight
    9/10 ·  P(w2|w1) = (9/10)·c12/c1 + (1/10)·c2/N, where c1 counts w1
    as bigram-LEFT, c2 counts w2 as bigram-RIGHT, and N is total bigram
    mass — all marginals derived from the bigram table itself (single
    explode pass; same event space, so probabilities sum to 1 exactly).
    As one exact rational: P = (9·c12·N + c1·c2) / (10·c1·N).

    Returns ``(id_col, nll_micro, n_big)``; ``nll_micro`` is the doc's
    total NLL in integer MICRO-NATS — one ``floor(-ln(num/den)·1e6)``
    per distinct corpus bigram (num/den as exact 64-bit integers cast to
    double), then a pure integer weighted sum per doc: order-independent
    and bit-identical to the SQL mirror (same cross-engine ulp tolerance
    as unigram_nll).  Docs with <2 tokens emit no bigrams and drop out
    (both engines).  Overflow envelope: 9·c12·N needs c12·N < 2^59 —
    holds through ~10^9 bigrams of corpus with hot bigrams ≤ 10^9; past
    that, compute the two interpolation terms' logs in DECIMAL or split
    the rational.

    Scale shape: doc-bigram counts = one groupBy(id, w1, w2) with
    map-side combine; corpus bigram table re-aggregates it; c1/c2
    marginals re-aggregate THAT (three shrinking aggs, no second corpus
    scan); N is a one-row broadcast scalar; the score join is pinned
    shuffle-hash BUILT FROM the scored-bigram side (same wrong-side-
    broadcast OOM guard as unigram_nll — the doc-bigram side is the big
    one).
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    big = (
        df.filter(n >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("w1"),
                        F.element_at(toks, i + 1).alias("w2"),
                    ),
                )
            ).alias("_b"),
        )
        .select(id_col, "_b.w1", "_b.w2")
    )
    doc_big = big.groupBy(id_col, "w1", "w2").agg(
        F.count("*").cast("long").alias("c_d12")
    )
    c12 = doc_big.groupBy("w1", "w2").agg(F.sum("c_d12").alias("c_12"))
    c1 = c12.groupBy("w1").agg(F.sum("c_12").alias("c_1"))
    c2 = c12.groupBy("w2").agg(F.sum("c_12").alias("c_2"))
    tot = c12.agg(F.sum("c_12").cast("long").alias("n_all"))
    num = (F.lit(9) * F.col("c_12") * F.col("n_all") + F.col("c_1") * F.col("c_2")).cast(
        "double"
    )
    den = (F.lit(10) * F.col("c_1") * F.col("n_all")).cast("double")
    scored = (
        c12.join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.floor(-F.log(num / den) * 1e6).cast("long").alias("nll_big_micro"),
        )
    )
    return (
        doc_big.join(scored.hint("shuffle_hash"), ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum(F.col("c_d12") * F.col("nll_big_micro")).alias("nll_micro"),
            F.sum("c_d12").alias("n_big"),
        )
    )


def bigram_nll_sql(rel: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB mirror: identical rational, identical micro-nat floor."""
    return f"""
    WITH big AS (
      SELECT {id_col}, t[i] AS w1, t[i+1] AS w2
      FROM (SELECT {id_col}, string_split({text_col}, ' ') AS t FROM {rel}) s,
           unnest(range(1, len(t))) r(i)
      WHERE len(t) >= 2
    ),
    doc_big AS (
      SELECT {id_col}, w1, w2, CAST(count(*) AS BIGINT) AS c_d12
      FROM big GROUP BY 1, 2, 3
    ),
    c12 AS (SELECT w1, w2, sum(c_d12) AS c_12 FROM doc_big GROUP BY 1, 2),
    c1t AS (SELECT w1, sum(c_12) AS c_1 FROM c12 GROUP BY 1),
    c2t AS (SELECT w2, sum(c_12) AS c_2 FROM c12 GROUP BY 1),
    tot AS (SELECT CAST(sum(c_12) AS BIGINT) AS n_all FROM c12),
    scored AS (
      SELECT w1, w2,
             CAST(floor(-ln(CAST(9 * c_12 * n_all + c_1 * c_2 AS DOUBLE)
                            / CAST(10 * c_1 * n_all AS DOUBLE)) * 1e6)
                  AS BIGINT) AS nll_big_micro
      FROM c12 JOIN c1t USING (w1) JOIN c2t USING (w2), tot
    )
    SELECT d.{id_col},
           CAST(sum(d.c_d12 * s.nll_big_micro) AS BIGINT) AS nll_micro,
           CAST(sum(d.c_d12) AS BIGINT) AS n_big
    FROM doc_big d JOIN scored s USING (w1, w2)
    GROUP BY d.{id_col}
    """
