"""WARC source/sink: roundtrip, determinism, member split, error contract."""

import glob
import gzip
import hashlib
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


def test_warc_roundtrip_bytes(spark, tmp_path):
    from ssb_sgis_spark.sources.warc import read_warc, write_warc

    pages = _pages(spark).cache()
    d = str(tmp_path / "w")
    man = write_warc(pages, d, n_files=4).collect()
    assert sum(r.n_records for r in man) == pages.count()
    assert sorted(r.file for r in man) == sorted(
        os.path.basename(p) for p in glob.glob(d + "/*.warc.gz")
    )

    back = read_warc(spark, d)
    orig = {r.url: r for r in pages.collect()}
    got = back.collect()
    assert len(got) == len(orig)
    for r in got:
        o = orig[r.url]
        assert bytes(r.html) == bytes(o.html)  # byte-identical payload
        assert r.warc_ts == o.warc_ts
        assert r.http_status == 200
        assert r.record_id.startswith("<urn:uuid:")


def test_warc_write_is_deterministic(spark, tmp_path):
    from ssb_sgis_spark.sources.warc import write_warc

    pages = _pages(spark, n=80)
    sums = []
    for sub in ("a", "b"):
        d = str(tmp_path / sub)
        write_warc(pages, d, n_files=3).collect()
        sums.append(
            {
                os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
                for p in glob.glob(d + "/*.warc.gz")
            }
        )
    assert sums[0] == sums[1]


def test_warc_member_structure(spark, tmp_path):
    """Each file = 1 warcinfo member + 1 member per record, all independently
    decompressible; warcinfo is skipped by the reader."""
    from ssb_sgis_spark.sources.warc import _split_members, parse_warc_member, write_warc

    pages = _pages(spark, n=30)
    d = str(tmp_path / "w")
    man = {r.file: r.n_records for r in write_warc(pages, d, n_files=2).collect()}
    for p in glob.glob(d + "/*.warc.gz"):
        members = list(_split_members(open(p, "rb").read(), p))
        assert len(members) == man[os.path.basename(p)] + 1
        assert parse_warc_member(members[0]) is None  # warcinfo
        assert all(parse_warc_member(m) is not None for m in members[1:])


def test_warc_text_invariant(spark, tmp_path):
    """The input_hint invariant through the container: extracted text per
    url after a WARC encode/decode cycle equals the original text column."""
    from ssb_sgis_spark.operators.textops import extract_text
    from ssb_sgis_spark.sources.warc import read_warc, write_warc

    pages = _pages(spark).cache()
    d = str(tmp_path / "w")
    write_warc(pages, d, n_files=4).collect()
    back = extract_text(
        read_warc(spark, d).select("url", "html"), keep=["url"]
    ).select("url", "extracted_text")
    orig = {r.url: r.text for r in pages.select("url", "text").collect()}
    got = {r.url: r.extracted_text for r in back.collect()}
    assert got == orig


def test_warc_error_contract(spark, tmp_path):
    from ssb_sgis_spark.sources.warc import _split_members, parse_warc_member, write_warc

    pages = _pages(spark, n=10)
    d = str(tmp_path / "w")
    write_warc(pages, d, n_files=1).collect()
    [p] = glob.glob(d + "/*.warc.gz")
    raw = open(p, "rb").read()

    with pytest.raises(ValueError, match="bad magic"):
        list(_split_members(b"PK\x03\x04" + raw, "x"))
    with pytest.raises(ValueError, match="truncated gzip"):
        list(_split_members(raw[: len(raw) - 7], "x"))
    good = list(_split_members(raw, "x"))[1]
    with pytest.raises(ValueError, match="WARC version"):
        parse_warc_member(b"HTTP/1.1 200 OK\r\n\r\nhi")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_member(b"WARC/1.1\r\nWARC-Type: response\r\n\r\nbody")
    with pytest.raises(ValueError, match="payload truncated"):
        parse_warc_member(good[: len(good) - 40])


def test_warc_empty_input(spark, tmp_path):
    from ssb_sgis_spark.sources.warc import write_warc

    pages = _pages(spark).filter("uid < 0")
    d = str(tmp_path / "w")
    assert write_warc(pages, d, n_files=2).count() == 0
    assert glob.glob(d + "/*.warc.gz") == []


def test_warc_gzip_members_standard(spark, tmp_path):
    """Members are plain gzip — stdlib gzip.open can read the whole file
    stream (multi-member concatenation is part of RFC 1952)."""
    from ssb_sgis_spark.sources.warc import write_warc

    pages = _pages(spark, n=12)
    d = str(tmp_path / "w")
    write_warc(pages, d, n_files=1).collect()
    [p] = glob.glob(d + "/*.warc.gz")
    data = gzip.open(p, "rb").read()
    assert data.count(b"WARC/1.1\r\n") == 13  # warcinfo + 12 responses
