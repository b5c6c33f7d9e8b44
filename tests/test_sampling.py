"""Deterministic hash sampling + the composed corpus pipeline +
minhash dup groups."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ssb_sgis_spark.operators.sampling import (
    fraction_threshold_hex,
    sample_fraction,
    sample_fraction_pred_sql,
    sample_stratified,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.col("id"), F.lit(7)).cast("string").alias("stratum"),
    )


def test_sample_fraction_deterministic_and_sized(spark):
    d = _docs(spark)
    a = sorted(r.doc_id for r in sample_fraction(d, "doc_id", 0.2, "s").collect())
    b = sorted(r.doc_id for r in sample_fraction(d, "doc_id", 0.2, "s").collect())
    assert a == b
    # binomial(2000, 0.2): mean 400, sd ~17.9 — allow 5 sd
    assert 310 <= len(a) <= 490


def test_sample_fraction_nested_subsets(spark):
    """Same seed, smaller fraction => exact subset (threshold shrinks,
    hash per row is fixed) — lets a pipeline downsample consistently."""
    d = _docs(spark)
    small = {r.doc_id for r in sample_fraction(d, "doc_id", 0.05, "s").collect()}
    big = {r.doc_id for r in sample_fraction(d, "doc_id", 0.25, "s").collect()}
    assert small <= big and len(small) < len(big)


def test_sample_fraction_matches_duckdb(spark):
    d = _docs(spark)
    got = sorted(r.doc_id for r in sample_fraction(d, "doc_id", 0.13, "z").collect())
    pred = sample_fraction_pred_sql("doc_id", 0.13, "z")
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM range(2000) t(doc_id) WHERE {pred} ORDER BY doc_id"
        ).fetchall()
    ]
    assert got == want


def test_fraction_threshold_bounds():
    assert fraction_threshold_hex(0.0) == "00000000"
    # 1.0 is keep-ALL: "g" sorts above every hex string, so no row's
    # md5 prefix can equal-or-exceed it (a clamped "ffffffff" would
    # drop the 2^-32 of rows whose prefix is exactly that)
    assert fraction_threshold_hex(1.0) == "g"
    assert "ffffffff" < fraction_threshold_hex(1.0)
    with pytest.raises(ValueError):
        fraction_threshold_hex(1.5)


def test_sample_stratified_exact_k_and_salt_invariance(spark):
    d = _docs(spark, 700)  # strata of size 100 each
    out = sample_stratified(d, "stratum", 10, "doc_id", "s", nsalts=32)
    per = {r.stratum: r.n for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert per == {str(i): 10 for i in range(7)}
    # the salted two-stage plan must equal the single-window plan exactly
    plain = sample_stratified(d, "stratum", 10, "doc_id", "s", nsalts=1)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))


def test_sample_stratified_small_stratum_clamps(spark):
    d = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("only").alias("stratum")
    )
    assert sample_stratified(d, "stratum", 10, "doc_id").count() == 5


def test_minhash_dup_groups_transitive(spark):
    """A~B and B~C above threshold, A~C below: still ONE group."""
    from ssb_sgis_spark.operators.dedup import minhash_dup_groups

    base = [f"tok{i}" for i in range(40)]
    a = " ".join(base)
    b = " ".join(base[6:])   # 2-shingles: J(a,b) = 33/39 ≈ 0.846
    c = " ".join(base[12:])  # J(b,c) = 27/33 ≈ 0.818; J(a,c) = 27/39 ≈ 0.69
    other = " ".join(f"zz{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, other)], ["doc_id", "text"]
    )
    # shingle k small so shingle-Jaccard tracks token overlap closely;
    # 8 bands x 2 rows so banding recall at J≈0.82 is ~1-0.33^8
    out = {
        r.doc_id: r.grp
        for r in minhash_dup_groups(
            df, tau_num=7, tau_den=10, k=2, bands=8
        ).collect()
    }
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == 4


def test_corpus_pipeline_funnel(spark):
    """Each stage drops exactly the docs it should; survivors are packed
    in id order with contiguous offsets."""
    from ssb_sgis_spark.operators.pipeline import corpus_pipeline

    good = " ".join(
        "the observation and analysis of temporal patterns leads to"
        " understanding word%d because networks propagate information"
        " through complex adaptive layers" % i
        for i in range(4)
    )  # 76 tokens, mean word length ~7, stopword-rich, diverse
    bench_text = " ".join(
        "evaluation question%d regarding standardized assessment answers"
        " compared against reference solutions provided" % i
        for i in range(6)
    )  # 54 tokens, fully disjoint from `good`
    docs = [
        (1, good + " one"),
        (2, "too short"),                   # fails quality (too_short)
        (3, good + " one"),                 # exact dup of 1 -> dropped
        (4, bench_text + " the and of to is leaked copy"),  # contaminated
        (5, good + " five"),
    ]
    bench = [(99, bench_text)]
    corpus = spark.createDataFrame(docs, ["doc_id", "text"])
    bench_df = spark.createDataFrame(bench, ["doc_id", "text"])
    out = corpus_pipeline(
        corpus, bench_df, ctx_len=50, min_tokens=40, contam_n=8
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 5}
    assert rows[1].cum_before == 0
    assert rows[5].cum_before == rows[1].n_tokens
    assert rows[1].seq_first == 0 and rows[1].seq_last > 0  # 81 tokens / 50


# ------------------------------------------------------- paragraph dedup
def test_dedup_paragraphs_first_occurrence(spark):
    """Repeated chunks keep only their (min doc, min pos) copy; docs are
    reassembled in position order; fully-duplicated docs come back
    empty with n_kept=0."""
    from ssb_sgis_spark.operators.dedup import dedup_paragraphs

    a = "a b c d"   # chunks (w=2): "a b", "c d"
    b = "c d x y"   # "c d" already seen in doc 1 → keeps only "x y"
    c = "a b c d"   # exact copy of doc 1 → everything dropped
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    out = {r.doc_id: (r.text, r.n_kept) for r in
           dedup_paragraphs(df, chunk_tokens=2).collect()}
    assert out[1] == ("a b c d", 2)
    assert out[2] == ("x y", 1)
    assert out[3] == ("", 0)


def test_dedup_paragraphs_within_doc_repeat(spark):
    """A chunk repeated WITHIN one doc keeps only the earliest position."""
    from ssb_sgis_spark.operators.dedup import dedup_paragraphs

    df = spark.createDataFrame([(7, "p q p q r s")], "doc_id long, text string")
    out = dedup_paragraphs(df, chunk_tokens=2).collect()[0]
    assert out.text == "p q r s" and out.n_kept == 2


# ---------------------------------------------------------- corpus mixing
def test_mix_corpora_nested_and_exact(spark):
    """Upweighting a source strictly grows its kept set (nesting); a
    source at 0 weight (absent) drops entirely; the per-source subset
    equals sample_fraction at the same fraction."""
    from ssb_sgis_spark.operators.sampling import mix_corpora

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), F.pmod("id", F.lit(3)).cast("string")).alias("source"),
    )
    lo = mix_corpora(df, "source", {"s0": 0.2, "s1": 1.0}, "doc_id", "m")
    hi = mix_corpora(df, "source", {"s0": 0.6, "s1": 1.0}, "doc_id", "m")
    lo_ids = {r.doc_id for r in lo.collect()}
    hi_ids = {r.doc_id for r in hi.collect()}
    assert lo_ids <= hi_ids                      # nested
    assert not any(i % 3 == 2 for i in hi_ids)   # s2 absent → dropped
    # s1 at weight 1.0 is keep-ALL (the 'g' threshold sorts above every
    # md5 prefix)
    assert sum(1 for i in lo_ids if i % 3 == 1) == 1000
    s0_only = {
        r.doc_id
        for r in sample_fraction(
            df.filter("source = 's0'"), "doc_id", 0.2, "m"
        ).collect()
    }
    assert {i for i in lo_ids if i % 3 == 0} == s0_only


# --------------------------------------------------------- crawl delta
def test_crawl_delta_classes(spark):
    from ssb_sgis_spark.operators.domains import crawl_delta

    old = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "url string, content long"
    )
    new = spark.createDataFrame(
        [("b", 2), ("c", 99), ("d", 4)], "url string, content long"
    )
    out = {r.url: r.change for r in crawl_delta(old, new).collect()}
    # a removed, b unchanged (absent), c changed, d added
    assert out == {"a": "removed", "c": "changed", "d": "added"}


def test_crawl_delta_null_content(spark):
    """NULL vs '' content must count as changed (null-safe digest)."""
    from ssb_sgis_spark.operators.domains import crawl_delta

    old = spark.createDataFrame([("u", None), ("w", "x")], "url string, content string")
    new = spark.createDataFrame([("u", ""), ("w", None)], "url string, content string")
    out = {r.url: r.change for r in crawl_delta(old, new).collect()}
    assert out == {"u": "changed", "w": "changed"}


# ------------------------------------------------ exact substring spans
def test_dedup_spans_known_corpus(spark):
    """One 8-word window shared between two docs: only the later
    (doc_id, pos) occurrence is a span; the first stays."""
    from ssb_sgis_spark.operators.dedup import dedup_spans

    shared = "a b c d e f g h"
    df = spark.createDataFrame(
        [(0, shared + " x y"), (1, shared + " p q"), (2, "u v w z q r s t")],
        "doc_id long, text string",
    )
    rows = [tuple(r) for r in dedup_spans(df, span_tokens=8).collect()]
    assert rows == [(1, 1, 8, 8)]


def test_dedup_spans_merges_tiled_region(spark):
    """A repeated region longer than the window merges its tiling grams
    into ONE span covering the region."""
    from ssb_sgis_spark.operators.dedup import dedup_spans

    region = " ".join(f"w{i}" for i in range(12))  # 12 words
    df = spark.createDataFrame(
        [(0, region + " tail0 tail1"), (1, "head0 head1 " + region)],
        "doc_id long, text string",
    )
    rows = [tuple(r) for r in dedup_spans(df, span_tokens=8).collect()]
    # doc 1: grams at pos 3..7 (5 grams of 8 words) tile words 3..14
    assert rows == [(1, 3, 14, 12)]


def test_dedup_spans_within_doc_repeat(spark):
    """A window repeated WITHIN one doc dups its second occurrence."""
    from ssb_sgis_spark.operators.dedup import dedup_spans

    block = "a b c d e f g h"
    df = spark.createDataFrame(
        [(0, block + " gap1 gap2 gap3 " + block)],
        "doc_id long, text string",
    )
    rows = [tuple(r) for r in dedup_spans(df, span_tokens=8).collect()]
    assert rows == [(0, 12, 19, 8)]


def test_strip_dup_spans_reconstruction(spark):
    """strip_dup_spans removes exactly the merged-span words and keeps
    every doc (empty text allowed); removed counts equal span widths."""
    from ssb_sgis_spark.operators.dedup import dedup_spans, strip_dup_spans

    shared = "a b c d e f g h"
    df = spark.createDataFrame(
        [(0, shared + " x y"), (1, shared + " p q"), (2, "lone r s t u v w z")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.text, r.n_removed_words)
           for r in strip_dup_spans(df, span_tokens=8).collect()}
    assert out[0] == (shared + " x y", 0)
    assert out[1] == ("p q", 8)
    assert out[2][1] == 0
    spans = dedup_spans(df, span_tokens=8).groupBy("doc_id").agg(
        {"n_words": "sum"}
    ).collect()
    widths = {r.doc_id: r["sum(n_words)"] for r in spans}
    for d, (_, n_rm) in out.items():
        assert widths.get(d, 0) == n_rm


# --------------------------------------------- cross-snapshot dedup
def test_dedup_against_classes(spark):
    """Exact copy -> 'exact'; token-dropped copy -> 'near' (band hit +
    Jaccard >= 1/2); novel doc -> no row; matched_old_id = min match."""
    from ssb_sgis_spark.operators.dedup import dedup_against

    base = " ".join(f"w{(i * 11) % 37}" for i in range(30))
    old = spark.createDataFrame(
        [(1, base), (2, base), (3, "completely different words entirely here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base),                              # exact (matches 1 and 2)
            (11, base.rsplit(" ", 2)[0]),            # near (2 tokens dropped)
            (12, "zz yy xx ww vv uu tt ss"),         # novel
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.dup_kind, r.matched_old_id)
           for r in dedup_against(new, old).collect()}
    assert out[10] == ("exact", 1)
    assert out[11][0] == "near" and out[11][1] in (1, 2)
    assert 12 not in out


def test_dedup_against_exact_takes_precedence(spark):
    """A doc that is BOTH an exact and a near match reports once, as
    exact."""
    from ssb_sgis_spark.operators.dedup import dedup_against

    t = "alpha beta gamma delta epsilon zeta eta theta"
    old = spark.createDataFrame([(1, t)], "doc_id long, text string")
    new = spark.createDataFrame([(10, t)], "doc_id long, text string")
    rows = dedup_against(new, old).collect()
    assert len(rows) == 1 and rows[0].dup_kind == "exact"


def test_temperature_fractions_shapes():
    from ssb_sgis_spark.operators.sampling import temperature_fractions

    sizes = {"cc": 1_000_000, "wiki": 10_000, "books": 40_000}
    # T=1: natural proportions -> uniform scale factor
    f1 = temperature_fractions(sizes, 1.0, target_total=105_000)
    assert abs(f1["cc"] - 0.1) < 1e-9 and abs(f1["wiki"] - 0.1) < 1e-9
    # T=2 flattens: small sources keep a LARGER fraction than big ones
    f2 = temperature_fractions(sizes, 2.0, target_total=105_000)
    assert f2["wiki"] > f2["cc"] and f2["books"] > f2["cc"]
    # achieved mass ratio wiki:cc moves toward sqrt-size ratio
    m2 = {s: f2[s] * sizes[s] for s in sizes}
    import math

    assert abs(m2["wiki"] / m2["cc"] - math.sqrt(10_000 / 1_000_000)) < 1e-9
    # clamp: tiny source asked to up-sample stays at 1.0
    f3 = temperature_fractions(sizes, 100.0, target_total=2_000_000)
    assert f3["wiki"] == 1.0
    import pytest as _pt

    with _pt.raises(ValueError):
        temperature_fractions(sizes, 0)


def test_temperature_mix_integration(spark):
    from pyspark.sql import functions as F

    from ssb_sgis_spark.operators.sampling import (
        mix_corpora,
        temperature_fractions,
    )

    df = spark.range(0, 20_000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 8, "big").otherwise("small").alias("src"),
    )
    sizes = {r.src: r.n for r in df.groupBy("src").agg(F.count("*").alias("n")).collect()}
    fr = temperature_fractions(sizes, 2.0, target_total=8_000)
    kept = mix_corpora(df, "src", fr, key_col="id")
    got = {r.src: r.n for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()}
    for s in sizes:
        want = fr[s] * sizes[s]
        assert abs(got[s] - want) < 0.1 * want + 50  # Bernoulli tolerance
    # flattening really happened: small keeps a larger share than natural
    assert got["small"] / sizes["small"] > got["big"] / sizes["big"]
