"""Sitemap protocol parsing."""

from pyspark.sql import functions as F


_URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>https://a.no/1</loc><lastmod>2024-01-02</lastmod>"
    "<changefreq>daily</changefreq><priority>0.8</priority></url>"
    "<url><loc>\n  https://a.no/2  \n</loc></url>"  # whitespace + all-optional
    "<url><lastmod>2024-01-05</lastmod></url>"  # no loc: dropped
    "<url><loc>https://a.no/3</loc><priority>0.1</priority></url>"
    "</urlset>"
)

_INDEX = (
    '<?xml version="1.0"?><sitemapindex>'
    "<sitemap><loc>https://a.no/sitemap1.xml</loc>"
    "<lastmod>2024-02-01</lastmod></sitemap>"
    "<sitemap><loc>https://a.no/sitemap2.xml</loc></sitemap>"
    "</sitemapindex>"
)


def test_parse_urlset_optional_fields(spark):
    from ssb_sgis_spark.operators.sitemap import parse_sitemap

    df = spark.createDataFrame([("h", _URLSET)], "host string, sitemap_xml string")
    rows = parse_sitemap(df, keep=["host"]).orderBy("pos").collect()
    assert [r.loc for r in rows] == ["https://a.no/1", "https://a.no/2", "https://a.no/3"]
    assert [r.kind for r in rows] == ["page"] * 3
    assert rows[0].lastmod == "2024-01-02" and rows[0].changefreq == "daily"
    assert rows[0].priority == "0.8"
    assert rows[1].lastmod is None and rows[1].priority is None
    assert rows[2].lastmod is None and rows[2].priority == "0.1"
    # the loc-less entry occupied pos 2 and was dropped
    assert [r.pos for r in rows] == [0, 1, 3]


def test_parse_sitemapindex(spark):
    from ssb_sgis_spark.operators.sitemap import parse_sitemap

    df = spark.createDataFrame([(_INDEX,)], "sitemap_xml string")
    rows = parse_sitemap(df).orderBy("pos").collect()
    assert [r.kind for r in rows] == ["sitemap", "sitemap"]
    assert rows[0].loc == "https://a.no/sitemap1.xml"
    assert rows[0].lastmod == "2024-02-01" and rows[1].lastmod is None


def test_end_to_end_law(spark):
    """synthesize per-host sitemaps → parse → every page's entry comes
    back with the law's lastmod/priority optionality."""
    from __spark_entry__ import pages_df
    from ssb_sgis_spark.operators.sitemap import (
        parse_sitemap,
        sitemap_xml_of_pages,
    )
    from tests.conftest import SF_SMOKE

    pages = pages_df(spark, SF_SMOKE, with_payload=True).select(
        "uid", "url", "warc_ts"
    ).limit(500).cache()
    xml = sitemap_xml_of_pages(pages)
    got = {r.loc: r for r in parse_sitemap(xml, keep=["host"]).collect()}
    orig = pages.withColumn("d", F.date_format("warc_ts", "yyyy-MM-dd")).collect()
    assert len(got) == len(orig)
    for o in orig:
        r = got[o.url]
        assert r.host == o.url.split("/")[2]
        assert r.lastmod == (None if o.uid % 5 == 0 else o.d)
        assert r.priority == (None if o.uid % 3 != 0 else "0.%d" % (o.uid % 10))
        assert r.changefreq is None
