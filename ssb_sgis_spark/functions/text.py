"""Text-analysis column functions for the web-page / documents tables.

Everything here is a NATIVE Spark column expression (JVM-side, whole-stage
codegen) with a DuckDB SQL mirror — the training-data-pipeline analogue of
the engine's grid-id arithmetic: token counting, quality scoring,
stopword-profile language ID, and document fingerprinting.

These operate on the ``documents`` table (doc_id, text, lang, source,
n_chars) and the pages payload (input_hint shape).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("a", "the", "and", "of", "to")
# deterministic per-language profile words for the language-ID heuristic
LANG_PROFILES = {
    "en": ("the", "a", "and", "value", "fast"),
    "no": ("og", "i", "det", "en", "som"),
    "nn": ("og", "ein", "ikkje", "som", "av"),
}
LANG_ORDER = ("en", "no", "nn")


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("long")


def char_count_col(text: Column) -> Column:
    return F.length(text).cast("long")


# GPT-2-style pre-tokenizer, restricted to RE2-compatible constructs (no
# lookahead) so Spark's Java regex and DuckDB's RE2 count identically —
# verified bit-equal on contractions, punctuation runs, digits,
# leading/trailing/multiple spaces, and vertical tab.  ASCII classes:
# the synthetic corpus is ASCII, and \p{L} subtleties differ across
# engines.  Whitespace is an EXPLICIT class, not \s: Java's \s includes
# \x0B but RE2's does not, so \s would diverge on vertical tab.
_WS = r" \t\n\f\r\x0B"
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    rf"| ?[^A-Za-z0-9{_WS}]+|[{_WS}]+"
)


def bpe_token_count_col(text: Column) -> Column:
    """Subword-style token count: matches of the BPE-ish pre-tokenizer
    regex (the whitespace split undercounts punctuation-heavy text the
    way no real tokenizer does)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN)).cast("long")


def bpe_token_count_sql(t: str = "text") -> str:
    pat = BPE_TOKEN_PATTERN.replace("'", "''")
    return f"CAST(len(regexp_extract_all({t}, '{pat}')) AS BIGINT)"


def avg_token_len_col(text: Column) -> Column:
    """Mean token length ×1000, floored — integer output avoids float
    summation-order hazards in the oracle compare."""
    toks = tokens_col(text)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    return F.floor(total * 1000 / F.size(toks)).cast("long")


def stopword_count_col(text: Column) -> Column:
    toks = tokens_col(text)
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("long")


def lang_score_col(text: Column, lang: str) -> Column:
    toks = tokens_col(text)
    prof = F.array(*[F.lit(s) for s in LANG_PROFILES[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(prof, t))).cast("long")


def lang_guess_col(text: Column) -> Column:
    """argmax of profile-word hit counts, first-listed language wins ties —
    the stopword-profile language-ID heuristic."""
    scores = {lang: lang_score_col(text, lang) for lang in LANG_ORDER}
    best = F.lit(LANG_ORDER[-1])
    # fold right-to-left so earlier languages win ties (>= keeps earlier)
    for lang in reversed(LANG_ORDER[:-1]):
        later_max = None
        for other in LANG_ORDER[LANG_ORDER.index(lang) + 1 :]:
            later_max = scores[other] if later_max is None else F.greatest(later_max, scores[other])
        best = F.when(scores[lang] >= later_max, F.lit(lang)).otherwise(best)
    return best


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 of the sorted distinct token set (a
    set-based content fingerprint — order-insensitive, whitespace-stable)."""
    toks = F.array_sort(F.array_distinct(tokens_col(text)))
    return F.md5(F.array_join(toks, " "))


# -------------------------------------------------------------- SQL mirrors
def token_count_sql(t: str = "text") -> str:
    return f"CAST(len(string_split({t}, ' ')) AS BIGINT)"


def char_count_sql(t: str = "text") -> str:
    return f"CAST(length({t}) AS BIGINT)"


def word_chars_col(text: Column) -> Column:
    """Characters belonging to words (total length minus separator
    spaces) — the numerator of Gopher's mean-word-length rule."""
    return F.length(F.translate(text, " ", "")).cast("long")


def word_chars_sql(t: str = "text") -> str:
    return f"CAST(length(replace({t}, ' ', '')) AS BIGINT)"


def avg_token_len_sql(t: str = "text") -> str:
    return (
        f"CAST(floor(list_sum(list_transform(string_split({t}, ' '), x -> length(x)))"
        f" * 1000 / len(string_split({t}, ' '))) AS BIGINT)"
    )


def _in_list_sql(word: str, words: tuple) -> str:
    lits = ", ".join(f"'{w}'" for w in words)
    return f"list_contains([{lits}], {word})"


def stopword_count_sql(t: str = "text") -> str:
    return (
        f"CAST(len(list_filter(string_split({t}, ' '), "
        f"x -> {_in_list_sql('x', STOPWORDS)})) AS BIGINT)"
    )


def lang_score_sql(lang: str, t: str = "text") -> str:
    return (
        f"CAST(len(list_filter(string_split({t}, ' '), "
        f"x -> {_in_list_sql('x', LANG_PROFILES[lang])})) AS BIGINT)"
    )


def lang_guess_sql(t: str = "text") -> str:
    s = {lang: lang_score_sql(lang, t) for lang in LANG_ORDER}
    expr = f"'{LANG_ORDER[-1]}'"
    for lang in reversed(LANG_ORDER[:-1]):
        later = LANG_ORDER[LANG_ORDER.index(lang) + 1 :]
        later_max = "greatest(" + ", ".join(s[o] for o in later) + ")" if len(later) > 1 else s[later[0]]
        expr = f"CASE WHEN {s[lang]} >= {later_max} THEN '{lang}' ELSE {expr} END"
    return expr


def fingerprint_sql(t: str = "text") -> str:
    return f"md5(array_to_string(list_sort(list_distinct(string_split({t}, ' '))), ' '))"


# ---- repetition signals (Gopher-style quality rules) -----------------
#
# Repetitious documents (boilerplate, keyword stuffing, scraper loops)
# are the single biggest bulk-filter in web-corpus pipelines.  Both
# signals below are PER-ROW native expressions — no explode, no shuffle:
# the usual unnest→groupBy plan turns every 500-token document into 500
# shuffle rows, which at 10^12 documents is the difference between a
# map-only stage and a petabyte shuffle.


def distinct_token_count_col(text: Column) -> Column:
    return F.size(F.array_distinct(tokens_col(text))).cast("long")


def distinct_token_count_sql(t: str = "text") -> str:
    return f"CAST(len(list_distinct(string_split({t}, ' '))) AS BIGINT)"


def bigrams_col(text: Column) -> Column:
    toks = tokens_col(text)
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, F.lit(1), n - 1),
        F.slice(toks, F.lit(2), n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def top_bigram_count_col(text: Column) -> Column:
    """Occurrences of the most frequent token bigram — computed per row
    as the longest equal-run of the SORTED bigram array (a fold over the
    array, not an explode+groupBy), so the whole quality pass stays a
    map-only stage.  0 for single-token documents."""
    sb = F.array_sort(bigrams_col(text))
    zero = F.lit(0).cast("long")
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("best"),
    )

    def step(a, x):
        run = F.when(x.eqNullSafe(a["prev"]), a["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(a["best"], run).alias("best"),
        )

    return F.aggregate(sb, acc0, step, lambda a: a["best"])


# ------------------------------------------------------------------- PII
# Redaction patterns, restricted to RE2-compatible constructs (no
# lookaround / backrefs) so Spark's Java regex and DuckDB's RE2 find the
# SAME matches — the redacted text is compared byte-for-byte by the
# oracle.  The phone pattern is the strict "+CC NN NN NN NN" form the
# synthetic injector emits; a looser pattern would still be RE2-safe but
# a strict one keeps the parity argument trivial.
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_PHONE_PATTERN = r"\+[0-9][0-9] [0-9][0-9] [0-9][0-9] [0-9][0-9] [0-9][0-9]"
PII_EMAIL_TOKEN = "<EMAIL>"
PII_PHONE_TOKEN = "<PHONE>"


def pii_count_col(text: Column) -> Column:
    """Number of PII matches (emails + phones) — native regexp_count."""
    return (
        F.regexp_count(text, F.lit(PII_EMAIL_PATTERN))
        + F.regexp_count(text, F.lit(PII_PHONE_PATTERN))
    ).cast("long")


def pii_redact_col(text: Column) -> Column:
    """Text with every email/phone replaced by a type token.  All-native
    regexp_replace chain (replace-all semantics on both engines); at
    10^12 docs this is a map-only stage inside the scan."""
    out = F.regexp_replace(text, PII_EMAIL_PATTERN, PII_EMAIL_TOKEN)
    return F.regexp_replace(out, PII_PHONE_PATTERN, PII_PHONE_TOKEN)


def pii_count_sql(t: str = "text") -> str:
    return (
        f"CAST(len(regexp_extract_all({t}, '{PII_EMAIL_PATTERN}'))"
        f" + len(regexp_extract_all({t}, '{PII_PHONE_PATTERN}')) AS BIGINT)"
    )


def pii_redact_sql(t: str = "text") -> str:
    return (
        f"regexp_replace(regexp_replace({t}, '{PII_EMAIL_PATTERN}', "
        f"'{PII_EMAIL_TOKEN}', 'g'), '{PII_PHONE_PATTERN}', "
        f"'{PII_PHONE_TOKEN}', 'g')"
    )


# ---------------------------------------------------------- collocations
def pmi_collocations(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
):
    """Top-k PMI collocations (adjacent-token bigrams) over the corpus:
    ``(w1, w2, c_xy, pmi_micro)`` — pointwise mutual information
    ``ln(c_xy * N / (c_x * c_y))`` floored once per bigram into integer
    micro-nats (the unigram_nll discipline), N = total bigram mass.

    Scale shape: two map-side-combinable token aggs (unigrams from the
    bigram table itself — no second explode pass), two broadcast-free
    equi-joins on the word, the corpus scalar as a one-row broadcast,
    and the final top-k as orderBy+limit (TakeOrdered — per-partition
    heaps, no global sort).  ``min_count`` prunes the long tail before
    the joins.
    """
    from pyspark.sql import functions as F

    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    big = df.filter(n >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.element_at(toks, i).alias("w1"),
                    F.element_at(toks, i + 1).alias("w2"),
                ),
            )
        ).alias("_b")
    ).select("_b.w1", "_b.w2")
    cxy = big.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c_xy"))
    # unigram marginals from the bigram table: c_x = count as LEFT word,
    # c_y = count as RIGHT word (so the marginals and N live in the same
    # event space and PMI is exactly ln(P(x,y)/(P(x)P(y))))
    cx = cxy.groupBy("w1").agg(F.sum("c_xy").alias("c_x"))
    cy = cxy.groupBy("w2").agg(F.sum("c_xy").alias("c_y"))
    tot = cxy.agg(F.sum("c_xy").cast("long").alias("n_big"))
    scored = (
        cxy.filter(F.col("c_xy") >= int(min_count))
        .join(cx, "w1")
        .join(cy, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c_xy",
            F.floor(
                F.lit(1_000_000.0)
                * F.log(
                    (F.col("c_xy") * F.col("n_big")).cast("double")
                    / (F.col("c_x") * F.col("c_y")).cast("double")
                )
            )
            .cast("long")
            .alias("pmi_micro"),
        )
    )
    return scored.orderBy(
        F.col("pmi_micro").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(int(top_k))


def pmi_collocations_sql(
    rel: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> str:
    toks = f"string_split({text_col}, ' ')"
    return f"""
    WITH big AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM (SELECT {toks} AS t FROM {rel}) s,
           unnest(range(1, len(t))) r(i)
      WHERE len(t) >= 2
    ),
    cxy AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy FROM big GROUP BY w1, w2),
    cx AS (SELECT w1, sum(c_xy) AS c_x FROM cxy GROUP BY w1),
    cy AS (SELECT w2, sum(c_xy) AS c_y FROM cxy GROUP BY w2),
    tot AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_big FROM cxy)
    SELECT w1, w2, c_xy,
           CAST(floor(1000000.0 * ln(
               CAST(c_xy * n_big AS DOUBLE) / CAST(c_x * c_y AS DOUBLE)
           )) AS BIGINT) AS pmi_micro
    FROM cxy JOIN cx USING (w1) JOIN cy USING (w2) CROSS JOIN tot
    WHERE c_xy >= {int(min_count)}
    ORDER BY pmi_micro DESC, w1 ASC, w2 ASC
    LIMIT {int(top_k)}
    """
