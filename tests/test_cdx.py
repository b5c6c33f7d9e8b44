"""CDX index: SURT keys, span correctness via ranged reads, sorted shards."""

import glob
import gzip
import os

import pytest

from tests.conftest import SF_SMOKE


def _pages(spark, n=200):
    from ssb_sgis_spark.sources.pages import pages_df

    return (
        pages_df(spark, SF_SMOKE, with_payload=True)
        .select("uid", "url", "warc_ts", "html", "text")
        .filter("uid % 7 < 5")
        .limit(n)
    )


@pytest.fixture()
def warc_dir(spark, tmp_path):
    from ssb_sgis_spark.sources.warc import write_warc

    pages = _pages(spark).cache()
    d = str(tmp_path / "w")
    write_warc(pages, d, n_files=4).collect()
    return d, pages


def test_surt_forms_agree(spark):
    """surt_col ≡ surt_sql on assorted URLs (incl. www-strip, subdomain,
    query keep, fragment drop)."""
    import duckdb
    import pandas as pd

    from ssb_sgis_spark.functions.url import surt_col, surt_sql
    from pyspark.sql import functions as F

    urls = [
        "https://site42.no/p/123",
        "https://www.a.site7.no/p/42?q=1",
        "http://WWW.Example.COM/x/y/",
        "https://site1.no/p/9#frag",
        "https://no/",
    ]
    got = {
        r.url: r.s
        for r in spark.createDataFrame([(u,) for u in urls], "url string")
        .select("url", surt_col(F.col("url")).alias("s"))
        .collect()
    }
    df = pd.DataFrame({"url": urls})  # noqa: F841 — duckdb reads it by name
    want = dict(
        duckdb.sql(f"SELECT url, {surt_sql('url')} AS s FROM df")
        .df()
        .itertuples(index=False, name=None)
    )
    assert got == want
    assert got["https://www.a.site7.no/p/42?q=1"] == "no,site7,a)/p/42?q=1"
    assert got["https://site1.no/p/9#frag"] == "no,site1)/p/9"


def test_cdx_spans_fetch_exact_records(spark, warc_dir):
    """Every (filename, offset, length) span, read directly from disk and
    gunzipped, decodes to exactly the record the index row describes —
    the random-access contract."""
    from ssb_sgis_spark.sources.cdx import build_cdx
    from ssb_sgis_spark.sources.warc import parse_warc_member

    d, pages = warc_dir
    idx = build_cdx(spark, d).collect()
    orig = {r.url: r for r in pages.collect()}
    assert len(idx) == len(orig)
    for row in idx:
        with open(os.path.join(d, row.filename), "rb") as f:
            f.seek(row.offset)
            member = gzip.decompress(f.read(row.length))
        rec = parse_warc_member(member, row.filename)
        assert rec["url"] == row.url
        assert bytes(rec["html"]) == bytes(orig[row.url].html)


def test_cdx_fetch_distributed(spark, warc_dir):
    """fetch_cdx on a filtered index returns exactly those records with
    byte-identical payloads."""
    from ssb_sgis_spark.sources.cdx import build_cdx, fetch_cdx

    d, pages = warc_dir
    idx = build_cdx(spark, d).filter("http_status = 200")
    want_urls = {r.url for r in pages.collect() if r.uid % 3 == 0}
    picked = idx.filter(idx.url.isin(*want_urls) if want_urls else "false")
    got = {r.url: bytes(r.html) for r in fetch_cdx(picked, d).collect()}
    orig = {r.url: bytes(r.html) for r in pages.collect() if r.url in want_urls}
    assert got == orig


def test_cdx_sorted_shards(spark, warc_dir, tmp_path):
    """write_cdx shards own disjoint contiguous SURT ranges and are sorted
    within each file (footer min/max pruning is real)."""
    import pyarrow.parquet as pq

    from ssb_sgis_spark.sources.cdx import build_cdx, read_cdx, write_cdx

    d, pages = warc_dir
    out = str(tmp_path / "cdx")
    write_cdx(build_cdx(spark, d), out, n_shards=4)

    ranges = []
    for p in sorted(glob.glob(out + "/part-*.parquet")):
        surts = pq.read_table(p, columns=["surt"])["surt"].to_pylist()
        if not surts:
            continue
        assert surts == sorted(surts)  # sorted within shard
        ranges.append((min(surts), max(surts)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint ranges across shards

    assert read_cdx(spark, out).count() == pages.count()


def test_cdx_digest_is_payload_md5(spark, warc_dir):
    import hashlib

    from ssb_sgis_spark.sources.cdx import build_cdx

    d, pages = warc_dir
    idx = {r.url: r.digest for r in build_cdx(spark, d).collect()}
    for r in pages.collect():
        assert idx[r.url] == hashlib.md5(bytes(r.html)).hexdigest()
