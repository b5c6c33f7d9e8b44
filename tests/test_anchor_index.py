"""Anchor-text extraction + per-target aggregation."""

from tests.conftest import SF_SMOKE


def test_extract_anchors_pairs(spark):
    from ssb_sgis_spark.operators.links import extract_anchors

    html = (
        '<p>x</p><a href="https://a.no/1">first link</a>'
        '<a href="https://b.no/2" rel="nofollow">second</a>'
    ).encode()
    df = spark.createDataFrame([(1, html)], "uid int, html binary")
    got = [(r.pos, r.href, r.anchor_text) for r in extract_anchors(df).collect()]
    assert got == [
        (0, "https://a.no/1", "first link"),
        (1, "https://b.no/2", "second"),
    ]


def test_anchor_index_topk_counts(spark):
    from ssb_sgis_spark.operators.links import anchor_text_index

    rows = (
        [(i, 0, "t", "home") for i in range(5)]
        + [(i, 0, "t", "front page") for i in range(3)]
        + [(9, 0, "t", "misc")]
        + [(9, 0, "u", "only")]
    )
    anchors = spark.createDataFrame(
        rows, "uid int, pos int, href string, anchor_text string"
    )
    got = {(r.href, r.anchor_text): r.n
           for r in anchor_text_index(anchors, k=2).collect()}
    # top-2 per target by count; 'misc' (n=1) cut from t
    assert got == {("t", "home"): 5, ("t", "front page"): 3, ("u", "only"): 1}


def test_law_counts_match_arithmetic(spark):
    from ssb_sgis_spark.operators.linkgraph import _A, _B
    from ssb_sgis_spark.operators.links import (
        anchor_text_index,
        anchored_pages,
        extract_anchors,
    )
    from ssb_sgis_spark.sources.pages import pages_df

    pages = pages_df(spark, SF_SMOKE, with_payload=True).limit(400).select("uid", "html")
    idx = anchor_text_index(extract_anchors(anchored_pages(pages)))
    got = {(r.href, r.anchor_text): r.n for r in idx.collect()}
    exp: dict = {}
    for p in pages.select("uid").collect():
        for k in range(1, 2 + p.uid % 4):
            href = f"https://site{(p.uid * _A + k * _B) % 1000}.no/l/{k}"
            exp[(href, f"l{k}")] = exp.get((href, f"l{k}"), 0) + 1
    assert got == exp
