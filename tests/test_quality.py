"""Composed Gopher-style quality filter (operators/quality.py)."""

from ssb_sgis_spark.operators.quality import quality_filter


def test_quality_rules_and_first_fail_ordering(spark):
    docs = [
        # passes every rule: 45 distinct-ish words with stopwords
        (1, "the quick brown fox jumps over a lazy dog " * 5 + "and then it runs home fast"),
        # too short
        (2, "tiny doc"),
        # repetitive AND low-diversity (stopword-rich so low_stopword
        # can't fire) — fail_reason must be the FIRST failing rule in
        # declaration order (repetitive precedes low_diversity)
        (3, ("the spam " * 45).strip()),
        # no stopwords at all (40+ long-ish words)
        (4, " ".join(f"w{i}xyzq" for i in range(45))),
        # mean word length > 12 chars
        (5, " ".join("the" if i % 2 else "superduperlongtokenword" * 2 for i in range(50))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["quality_pass"], r["fail_reason"])
           for r in quality_filter(df).collect()}
    assert got[1] == (True, None)
    assert got[2] == (False, "too_short")
    assert got[3] == (False, "repetitive")
    assert got[4] == (False, "low_stopword")
    assert got[5] == (False, "word_length")


def test_word_length_excludes_separator_spaces(spark):
    """Mean word length is word chars / words — separator spaces must not
    count (length(text) would shift the documented [3,12] bounds ~1)."""
    # 50 words, total word chars exactly 600 -> mean exactly 12 (boundary,
    # must pass); diverse + stopword-rich so no other rule fires
    words_12 = (
        [f"w{i:02d}abcdefghijkl" for i in range(30)]   # 30 x 15 chars
        + ["the"] * 10                                  # 10 x 3 chars
        + [f"v{i:02d}abcdefghi" for i in range(10)]     # 10 x 12 chars
    )
    doc_mean_12 = " ".join(words_12)
    assert len(doc_mean_12.replace(" ", "")) == 600 and len(words_12) == 50
    # same doc plus one separator-heavy tweak: replace a 15-char word with
    # a 40-char one -> word chars 625, mean 12.5 > 12, must fail word_length
    doc_mean_12_5 = " ".join(["x" * 40] + words_12[1:])
    df = spark.createDataFrame(
        [(1, doc_mean_12), (2, doc_mean_12_5)], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["quality_pass"], r["fail_reason"])
           for r in quality_filter(df).collect()}
    assert got[1] == (True, None)          # boundary value passes
    assert got[2] == (False, "word_length")


def test_unigram_nll_closed_form(spark):
    """Tiny corpus with hand-checkable unigram stats: the integer
    micro-nat aggregate must equal the closed-form (floor once per
    vocab entry, then pure integer weighted sum)."""
    import math

    from ssb_sgis_spark.operators.quality import unigram_nll

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {r.doc_id: (r.nll_micro, r.n_tok) for r in unigram_nll(df).collect()}
    nll = {t: math.floor(-math.log(c / 5) * 1e6) for t, c in
           {"a": 2, "b": 2, "c": 1}.items()}
    assert out[1] == (2 * nll["a"] + nll["b"], 3)
    assert out[2] == (nll["b"] + nll["c"], 2)


def test_nll_buckets_matches_python_terciles(spark):
    """The head/middle/tail split must reproduce the exact
    lower-discrete-quantile rule applied in Python to the (already
    oracle-checked) unigram means: q_p = min(v : cum(v) >= ceil(p*N/1000)),
    head = mean <= q333, middle = mean <= q667, else tail."""
    import math

    from ssb_sgis_spark.operators.quality import nll_buckets, unigram_nll

    # 30 docs over a zipf-ish vocab so means are spread and ties exist
    docs = [
        (i, " ".join(f"w{(i * j) % (3 + i % 7)}" for j in range(5 + i % 11)))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    means = {
        r.doc_id: r.nll_micro // r.n_tok for r in unigram_nll(df).collect()
    }
    vals = sorted(means.values())
    n = len(vals)

    def q(p):
        return vals[max(1, math.ceil(p * n / 1000)) - 1]

    q33, q67 = q(333), q(667)
    want = {
        d: ("head" if m <= q33 else "middle" if m <= q67 else "tail")
        for d, m in means.items()
    }
    got = {r.doc_id: r.bucket for r in nll_buckets(df).collect()}
    assert got == want
    got_means = {r.doc_id: r.nll_mean_micro for r in nll_buckets(df).collect()}
    assert got_means == means
