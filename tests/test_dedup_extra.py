"""Containment (asymmetric inclusion) dedup — operators/dedup.py."""

from ssb_sgis_spark.operators.dedup import containment_pairs


def _docs(spark):
    quote = "the quick brown fox jumps over the lazy dog tonight"
    article = (
        "breaking news from the wire desk today "
        + quote
        + " officials later declined to comment on the report"
    )
    rows = [
        (1, quote),
        (2, article),
        (3, "completely unrelated text about maritime shipping routes and tides"),
        (4, "xy"),  # shorter than one shingle -> no shingle set
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_is_directional(spark):
    out = {
        (r.inner_id, r.outer_id): (r.n_shared, r.n_inner)
        for r in containment_pairs(_docs(spark), threshold=(9, 10)).collect()
    }
    # the quote is fully inside the article...
    assert (1, 2) in out
    n_shared, n_inner = out[(1, 2)]
    assert n_shared == n_inner  # every quote shingle appears in the article
    # ...but the article is NOT inside the quote, and unrelated/empty
    # docs produce nothing
    assert (2, 1) not in out
    assert all(a in (1,) and b in (2,) for a, b in out)


def test_containment_gram_cap_drops_boilerplate(spark):
    """A shingle shared by MORE than gram_cap docs must not generate
    pairs (the m^2 blow-up guard)."""
    boiler = "copyright footer text"
    rows = [(i, boiler) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert containment_pairs(df, gram_cap=4).count() == 0
    # raise the cap and the same corpus pairs up fully (5 docs -> 20
    # ordered pairs)
    assert containment_pairs(df, gram_cap=5).count() == 20


def test_normalized_dedup_collapses_formatting_variants(spark):
    from ssb_sgis_spark.operators.dedup import dedupe_normalized

    rows = [
        (1, "Hello, World!"),
        (2, "hello world"),          # same after normalization
        (3, "HELLO   WORLD !!"),     # same after normalization
        (4, "a different document"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id_kept: (r.n_copies, r.n_raw_variants)
           for r in dedupe_normalized(df).collect()}
    assert out == {1: (3, 3), 4: (1, 1)}
