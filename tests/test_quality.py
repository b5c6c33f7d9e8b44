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
