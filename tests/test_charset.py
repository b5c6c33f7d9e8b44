"""Charset sniffing: every branch, law round-trip, decode exactness."""

from tests.conftest import SF_SMOKE


def test_sniff_branches():
    from ssb_sgis_spark.operators.charset import sniff_charset

    body = "Blåbær østpå".encode("utf-8")
    assert sniff_charset(b"\xef\xbb\xbf" + body) == ("utf-8", True)
    assert sniff_charset(b"\xff\xfe" + "abc".encode("utf-16-le")) == ("utf-16-le", True)
    assert sniff_charset(b"\xfe\xff" + "abc".encode("utf-16-be")) == ("utf-16-be", True)
    # meta prescan + HTML5 alias table (latin1 label means windows-1252)
    assert sniff_charset(b'<meta charset="latin1">x') == ("windows-1252", False)
    assert sniff_charset(b"<meta charset='UTF-8'>x") == ("utf-8", False)
    assert sniff_charset(b'<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">') == (
        "windows-1252",
        False,
    )
    # undeclared: strict UTF-8 validation, then 1252 fallback
    assert sniff_charset("ingen deklarasjon, men blåbær".encode("utf-8")) == ("utf-8", False)
    assert sniff_charset("blåbær".encode("latin-1")) == ("windows-1252", False)
    # unknown label falls through to content sniffing
    assert sniff_charset(b'<meta charset="x-bogus-9">\xf8 raw') == ("windows-1252", False)
    # meta beyond the 1024-byte prescan window is ignored
    far = b"<!--" + b" " * 1100 + b'--><meta charset="utf-16le">ascii only'
    assert sniff_charset(far) == ("utf-8", False)


def test_detect_decode_law_roundtrip(spark):
    """detect_decode over the synthetic mixed-encoding captures ==
    the closed-form law (charset, bom, decoded string) — no byte ever
    consulted on the oracle side."""
    from ssb_sgis_spark.operators.charset import charset_captures_df, detect_decode
    from ssb_sgis_spark.sources.pages import pages_df

    pages = pages_df(spark, SF_SMOKE).limit(500)
    got = {
        r.uid: (r.charset, r.bom, r.decoded)
        for r in detect_decode(charset_captures_df(pages), keep=["uid"]).collect()
    }
    n_cases = set()
    for p in pages.collect():
        uid, m4, m8 = p.uid, p.uid % 4, p.uid % 8
        body = f"Søk på blåbærsyltetøy fra side {uid} i Ålesund"
        meta = lambda cs: f'<html><head><meta charset="{cs}"></head><body><p>{body}</p></body></html>'
        bare = f"<html><head></head><body><p>{body}</p></body></html>"
        if m4 == 0:
            exp = ("utf-8", True, meta("utf-8"))
        elif m8 == 5:
            exp = ("utf-8", False, bare)
        elif m4 == 1:
            exp = ("utf-8", False, meta("utf-8"))
        elif m8 == 6:
            exp = ("windows-1252", False, bare)
        elif m4 == 2:
            exp = ("windows-1252", False, meta("windows-1252"))
        else:
            exp = ("utf-16-le", True, meta("utf-16-le"))
        n_cases.add(exp[:2] + (exp[2][:20],))
        assert got[uid] == exp, uid
    assert len({(c, b) for c, b, _ in n_cases}) >= 4  # all sniff outcomes hit


def test_decode_is_exact_transcode(spark):
    """The decoded column is byte-identical UTF-8 regardless of the
    source encoding: all six law cases of the same uid-body agree after
    transcoding."""
    from ssb_sgis_spark.operators.charset import charset_captures_df, detect_decode
    from ssb_sgis_spark.sources.pages import pages_df
    from pyspark.sql import functions as F

    pages = pages_df(spark, SF_SMOKE).limit(800)
    dec = detect_decode(charset_captures_df(pages), keep=["uid"])
    # strip the (law-case-dependent) head so only the body remains, then
    # every row must contain the Norwegian body with its uid.
    body = dec.select(
        "uid", F.regexp_extract("decoded", r"<p>(.*)</p>", 1).alias("b")
    )
    bad = body.filter(
        F.col("b")
        != F.concat(
            F.lit("Søk på blåbærsyltetøy fra side "),
            F.col("uid").cast("string"),
            F.lit(" i Ålesund"),
        )
    )
    assert bad.count() == 0
