"""Distributed BPE merge training — learn a byte-pair-encoding merge
table from the corpus itself.

Sennrich et al. 2016 / GPT-2-style BPE training loop: represent every
word as a symbol sequence (initially characters), repeatedly find the
most frequent ADJACENT symbol pair across the corpus and merge it, and
record the merge order — the merge table IS the tokenizer.  An LLM-data
engine that counts tokens (``doc_stats``) and packs sequences
(``seq_pack``) should be able to TRAIN the vocabulary those steps
assume, on the same cluster that holds the corpus.

Distribution shape (the classic trick): BPE statistics only depend on
the **word histogram**, so the corpus collapses to one
``groupBy(word).sum()`` with map-side combine — at 10^12 documents the
histogram is orders of magnitude smaller than the corpus and naturally
partitioned.  Every merge round is then:

1. adjacent-pair counts — explode ``(sym_i, sym_i+1)`` weighted by the
   word count, one ``groupBy(a, b)`` (map-side combined);
2. argmax with a total tie order (count DESC, then pair lexicographic)
   — a one-row collect;
3. apply the merge to every symbol array with a **greedy
   leftmost-non-overlapping fold** (``F.aggregate``; DuckDB
   ``list_reduce`` computes the identical fold in the mirror), then
   eager-localCheckpoint the (small) histogram so the round chain
   doesn't branch exponentially — the same per-round checkpoint
   discipline as ``pagerank``.

Exactness: counts are 64-bit integers, the tie order is total, and the
fold is deterministic, so the merge table is bit-identical to the
unrolled-CTE DuckDB mirror.  The ONLY cross-engine assumption is binary
(codepoint) string comparison for the lexicographic tie-break — true
for both engines' defaults.

Precondition for the mirror: the corpus must supply at least
``n_merges`` rounds of pairs (the unrolled SQL has no early-exit);
the operator raises if pairs run dry first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["bpe_merges", "bpe_merges_sql", "bpe_token_stats", "bpe_token_stats_sql"]

_FOLD_SPARK = """
aggregate(syms, cast(array() as array<string>),
  (acc, x) -> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{a}'
                    AND x = '{b}'
              THEN concat(slice(acc, 1, size(acc) - 1), array('{a}{b}'))
              ELSE concat(acc, array(x)) END)
"""

_PAIRS_SPARK = """
transform(sequence(1, size(syms) - 1),
          i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))
"""


def _esc(s: str) -> str:
    return s.replace("'", "''")


def bpe_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    batch: int = 1,
    strategy: str = "prefix",
) -> DataFrame:
    """Train ``n_merges`` BPE merges on the corpus; returns the merge
    table ``(merge_rank, left_sym, right_sym, pair_count)`` — rank 1 is
    the first (most frequent) merge, applied before rank 2 counted.

    ``batch=1`` (default) is the exact sequential loop — one count +
    argmax + fold per merge; this is the oracle-mirrored path.
    ``batch=M>1`` is the scale path: per Spark round it counts pairs
    ONCE, selects up to M symbol-disjoint pairs from the ranked list,
    and applies all of them in ONE chained fold projection +
    checkpoint.  Driver round-trips drop from O(n_merges) to
    O(n_merges / M-bar).  Disjointness keeps every picked pair's count
    exact under the other picks' merges.  Two selection strategies:

    - ``strategy='prefix'`` (default): longest disjoint prefix — never
      skips a conflicting higher-ranked pair, so the sequential rank
      order is preserved up to created-pair tie dynamics (equal-count
      adjacent ranks can swap when a merge mid-batch creates the next
      link of a tied chain; measured on the sf0.01 documents corpus:
      first such swap at rank 27, counts identical).  ~2-3x fewer
      rounds.
    - ``strategy='greedy'``: top-M mutually-disjoint (skip past
      conflicts) — measured 16x fewer rounds / 3.1x wall at
      n_merges=256 on a 4k-word Zipf corpus, but tied and
      closely-ranked merges can come out reordered vs sequential; use
      when the merge TABLE ordering is not the contract (e.g. training
      a production vocab where any near-optimal merge order serves).

    Strict bit-parity with the unrolled SQL mirror is only *guaranteed*
    at ``batch=1``, because a pair newly created by an earlier batch
    member can in principle outrank a later one.

    Raises ``ValueError`` if the corpus runs out of distinct pairs
    before ``n_merges`` rounds (keep ``n_merges`` well under the
    character inventory's pair capacity)."""
    merges, _, _ = _train(df, n_merges, text_col, batch=batch, strategy=strategy)
    return df.sparkSession.createDataFrame(
        merges,
        "merge_rank long, left_sym string, right_sym string, pair_count long",
    )


def _train(
    df: DataFrame, n_merges: int, text_col: str, batch: int = 1,
    strategy: str = "prefix",
) -> tuple[list[tuple[int, str, str, int]], DataFrame, int]:
    """The shared training loop: returns the merge list, the final
    fully-folded word table ``(word, cnt, syms)`` — the tokenizer's
    vocabulary view, reused by :func:`bpe_token_stats` — and the number
    of Spark rounds (count+fold cycles) it took: ``n_merges`` at
    ``batch=1``, ~``n_merges / M-bar`` at ``batch=M``.

    ``strategy='prefix'`` (default) takes the longest symbol-disjoint
    prefix of the ranked pair list — order-preserving vs sequential.
    ``strategy='greedy'`` keeps scanning past conflicts and picks the
    top-M mutually-disjoint pairs — larger batches (max round
    reduction), but tied ranks can come out reordered vs sequential."""
    n_merges, batch = int(n_merges), max(1, int(batch))
    if strategy not in ("prefix", "greedy"):
        raise ValueError(f"strategy must be 'prefix' or 'greedy', got {strategy!r}")
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    cur = words.select(
        "word",
        "cnt",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        rounds += 1
        want = min(batch, n_merges - len(merges))
        pairs = (
            cur.filter(F.size("syms") >= 2)
            .select("cnt", F.explode(F.expr(_PAIRS_SPARK)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pair_count"))
        )
        top = (
            pairs.orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(1 if want == 1 else max(4 * want, 64))
            .collect()
        )
        if not top:
            raise ValueError(
                f"corpus exhausted after {len(merges)} merges (< n_merges="
                f"{n_merges}); the unrolled SQL mirror has no early exit"
            )
        # longest symbol-disjoint PREFIX of the ranked list: stop at the
        # first pair sharing a symbol (or a merged-output string) with an
        # earlier pick.  Stopping — not skipping — is what preserves the
        # sequential rank order: a skipped higher-ranked pair would still
        # win the next sequential argmax, reordering the table.
        picked: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for row in top:
            if len(picked) >= want:
                break
            a, b = row["a"], row["b"]
            if a in used or b in used or (a + b) in used:
                if strategy == "prefix":
                    break
                continue
            picked.append((a, b, int(row["pair_count"])))
            used.update((a, b, a + b))
        # chained fold: apply all picked merges (rank order) in ONE
        # projection + ONE checkpoint
        expr = "syms"
        for a, b, _ in picked:
            expr = _FOLD_SPARK.format(a=_esc(a), b=_esc(b)).replace(
                "aggregate(syms,", f"aggregate({expr},", 1
            )
        for a, b, c in picked:
            merges.append((len(merges) + 1, a, b, c))
        cur = cur.select(
            "word", "cnt", F.expr(expr).alias("syms")
        ).localCheckpoint(eager=True)
    return merges, cur, rounds


def bpe_token_stats(
    df: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with its own freshly-trained ``n_merges``-merge
    BPE and report per-document ``(id_col, n_words, n_bpe_tokens)`` —
    the fertility measurement (tokens per word) every tokenizer
    decision is judged by.

    Scale shape: the expensive fold runs ONCE per distinct word on the
    training histogram (Zipf-bounded — a 10^12-doc corpus has ~10^7-8
    distinct words, megabytes of (word, token_len)), so per-document
    cost is an explode + a broadcast join against that map + one
    combinable groupBy.  Documents whose text yields no words keep
    (0, 0) via the left join."""
    _, folded, _ = _train(df, n_merges, text_col)
    wl = folded.select("word", F.size("syms").cast("long").alias("_tl"))
    dw = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
    )
    per = (
        dw.join(F.broadcast(wl), "word")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("_tl").cast("long").alias("n_bpe_tokens"),
        )
    )
    return df.select(id_col).join(per, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_words"), F.lit(0)).cast("long").alias("n_words"),
        F.coalesce(F.col("n_bpe_tokens"), F.lit(0)).cast("long").alias("n_bpe_tokens"),
    )


def _chain_ctes(rel: str, n_merges: int, text_col: str) -> list[str]:
    """The unrolled training chain shared by both mirrors: w0 is the
    word histogram (word kept so the encode mirror can join back),
    p{r}/t{r} the pair counts + argmax, w{r} the folded histogram."""
    ctes = [
        f"""w0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
         list_transform(range(1, length(word) + 1),
                        i -> word[i]) AS syms
  FROM (
    SELECT unnest(string_split({text_col}, ' ')) AS word FROM {rel}
  ) WHERE length(word) > 0
  GROUP BY word
)"""
    ]
    for r in range(1, int(n_merges) + 1):
        ctes.append(
            f"""p{r} AS (
  SELECT syms[i] AS a, syms[i + 1] AS b, CAST(sum(cnt) AS BIGINT) AS pair_count
  FROM w{r - 1}, unnest(range(1, len(syms))) t(i)
  WHERE len(syms) >= 2
  GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"t{r} AS (SELECT a, b, pair_count FROM p{r} "
            f"ORDER BY pair_count DESC, a, b LIMIT 1)"
        )
        ctes.append(
            f"""w{r} AS (
  SELECT word, cnt, list_reduce(
    list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, s -> [s])),
    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = t{r}.a AND x[1] = t{r}.b
                THEN list_append(acc[1:len(acc) - 1], t{r}.a || t{r}.b)
                ELSE list_append(acc, x[1]) END
  ) AS syms
  FROM w{r - 1} CROSS JOIN t{r}
)"""
        )
    return ctes


def bpe_token_stats_sql(
    rel: str, n_merges: int, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB mirror of :func:`bpe_token_stats`: the same unrolled
    training chain, then per-document word explode joined to the folded
    word lengths."""
    ctes = _chain_ctes(rel, n_merges, text_col)
    n = int(n_merges)
    return f"""
    WITH {','.join(ctes)},
    wl AS (SELECT word, CAST(len(syms) AS BIGINT) AS tl FROM w{n}),
    dw AS (
      SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS word FROM {rel}
    ),
    per AS (
      SELECT dw.{id_col},
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(wl.tl) AS BIGINT) AS n_bpe_tokens
      FROM dw JOIN wl USING (word)
      WHERE length(dw.word) > 0
      GROUP BY dw.{id_col}
    )
    SELECT d.{id_col},
           CAST(coalesce(per.n_words, 0) AS BIGINT) AS n_words,
           CAST(coalesce(per.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
    FROM {rel} d LEFT JOIN per ON d.{id_col} = per.{id_col}
    """


def bpe_merges_sql(rel: str, n_merges: int, text_col: str = "text") -> str:
    """DuckDB mirror: fully unrolled rounds — pair counts, one-row
    argmax (same total tie order), identical greedy fold via
    ``list_reduce``."""
    ctes = _chain_ctes(rel, n_merges, text_col)
    unions = "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, a AS left_sym, "
        f"b AS right_sym, pair_count FROM t{r}"
        for r in range(1, int(n_merges) + 1)
    )
    return f"""
    WITH {','.join(ctes)}
    {unions}
    """
