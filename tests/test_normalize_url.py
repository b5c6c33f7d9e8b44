"""RFC 3986 normalization: stack-fold semantics, twin equivalence."""

import duckdb
import pytest


CASES = [
    ("HTTPS://Site7.No:443/a/b/../c/./d//e?b=2&a=1&utm_source=x#frag",
     "https://site7.no/a/c/d/e?a=1&b=2"),
    ("http://A.no:80/", "http://a.no/"),
    ("http://a.no:8080/x", "http://a.no:8080/x"),  # non-default port kept
    ("https://a.no", "https://a.no/"),
    ("https://a.no/x/../..", "https://a.no/"),      # pop past root
    ("https://a.no/../../y", "https://a.no/y"),     # leading dotdots
    ("https://a.no/a/../../b/c/../d", "https://a.no/b/d"),
    ("https://a.no/p/?fbclid=1", "https://a.no/p"),
    ("https://a.no/p?", "https://a.no/p"),
    ("https://a.no/./.", "https://a.no/"),
    ("https://a.no//x///y//", "https://a.no/x/y"),
    ("https://a.no/x?z=1&y=&ref=abc", "https://a.no/x?y=&z=1"),
]


def test_normalize_cases_spark(spark):
    from pyspark.sql import functions as F

    from ssb_sgis_spark.functions.url import normalize_url_col

    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r.n for r in df.select(normalize_url_col(F.col("url")).alias("n")).collect()]
    assert got == [e for _, e in CASES]


def test_normalize_twin_agrees_duckdb():
    from ssb_sgis_spark.functions.url import normalize_url_sql

    con = duckdb.connect()
    sql = normalize_url_sql("url")
    for u, expected in CASES:
        got = con.execute(f"select {sql} from (select ? as url)", [u]).fetchone()[0]
        assert got == expected, (u, got, expected)


def test_normalize_twin_agrees_on_generated(spark):
    """Spark HOF fold == DuckDB bounded-replace chain on a generated
    matrix of messy paths (depth <= 6 nesting, the documented bound)."""
    import itertools

    from pyspark.sql import functions as F

    from ssb_sgis_spark.functions.url import normalize_url_col, normalize_url_sql

    parts = ["a", "b", ".", "..", "x2"]
    urls = []
    for n in range(1, 4):
        for combo in itertools.product(parts, repeat=n):
            urls.append("https://h.no/" + "/".join(combo))
            urls.append("https://h.no//" + "//".join(combo) + "/")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got_spark = [
        r.n for r in df.select(normalize_url_col(F.col("url")).alias("n")).collect()
    ]
    con = duckdb.connect()
    con.execute("create table t(url varchar)")
    con.executemany("insert into t values (?)", [(u,) for u in urls])
    got_duck = [
        r[0]
        for r in con.execute(
            f"select {normalize_url_sql('url')} from t order by rowid"
        ).fetchall()
    ]
    assert got_spark == got_duck
