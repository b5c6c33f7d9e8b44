"""Canonicalization: extraction, composition with redirects, cycles."""

from tests.conftest import SF_SMOKE


def test_extract_canonical_fallback(spark):
    from ssb_sgis_spark.operators.canonicalize import extract_canonical

    rows = [
        ("u1", b'<html><head><link rel="canonical" href="https://x.no/clean"></head></html>'),
        ("u2", b"<html><head></head><body>nothing declared</body></html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r.url: r.canonical for r in extract_canonical(df).collect()}
    assert got == {"u1": "https://x.no/clean", "u2": "u2"}


def test_canonical_map_composition(spark):
    """alias -> redirect chain -> final page -> declared canonical."""
    from ssb_sgis_spark.operators.canonicalize import canonical_map

    pages = spark.createDataFrame(
        [
            ("https://a.no/p", b'<head><link rel="canonical" href="https://a.no/c"></head>'),
            ("https://b.no/p", b"<head></head>"),
        ],
        "url string, html binary",
    )
    edges = spark.createDataFrame(
        [
            ("https://a.no/r1", "https://a.no/r2"),
            ("https://a.no/r2", "https://a.no/p"),
            ("https://b.no/r1", "https://b.no/p"),
            ("loop1", "loop2"),
            ("loop2", "loop1"),
        ],
        "src string, dst string",
    )
    got = {r.url: r.canonical for r in canonical_map(pages, edges).collect()}
    assert got["https://a.no/r1"] == "https://a.no/c"
    assert got["https://a.no/r2"] == "https://a.no/c"
    assert got["https://a.no/p"] == "https://a.no/c"
    assert got["https://b.no/r1"] == "https://b.no/p"  # no declaration: final
    assert got["https://b.no/p"] == "https://b.no/p"
    assert got["loop1"] is None and got["loop2"] is None  # cycles -> NULL


def test_law_matches_closed_form(spark):
    from ssb_sgis_spark.operators.canonicalize import canonical_map, canonical_pages_df
    from ssb_sgis_spark.operators.redirects import redirect_captures_df
    from ssb_sgis_spark.sources.pages import pages_df

    pages = pages_df(spark, SF_SMOKE).filter("uid % 7 = 0").limit(300)
    cmap = canonical_map(canonical_pages_df(pages), redirect_captures_df(pages))
    got = {r.url: r.canonical for r in cmap.collect()}
    for p in pages.collect():
        site = f"https://site{p.uid % 1000}.no"
        exp = f"{site}/c/{p.uid}" if p.uid % 3 == 0 else f"{site}/p/{p.uid}"
        assert got[f"{site}/p/{p.uid}"] == exp
        for k in range(1 + p.uid % 13):
            assert got[f"{site}/r/{p.uid}/{k}"] == exp
