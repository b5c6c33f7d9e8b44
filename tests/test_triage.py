"""Fetch triage: precedence, soft-404 heuristics, law parity."""

from tests.conftest import SF_SMOKE


def test_precedence_and_heuristics(spark):
    from ssb_sgis_spark.operators.triage import classify_fetches

    rows = [
        (1, 301, "Page not found"),          # status beats body
        (2, 404, "fine content"),
        (3, 503, "x"),
        (4, 200, "   "),
        (5, 200, "404 Error - this Does Not Exist"),
        (6, 200, "long article that mentions page not found " + "x" * 2000),
        (7, 200, "normal content here"),
    ]
    df = spark.createDataFrame(rows, "id int, http_status int, text string")
    got = {r.id: r.disposition for r in classify_fetches(df).collect()}
    assert got == {
        1: "redirect", 2: "client_error", 3: "server_error",
        4: "empty", 5: "soft_404", 6: "ok", 7: "ok",
    }


def test_marker_beyond_probe_window_is_ok(spark):
    from ssb_sgis_spark.operators.triage import classify_fetches

    pad = "a " * 300  # pushes the marker past probe_chars=512
    df = spark.createDataFrame(
        [(1, 200, pad + "page not found")], "id int, http_status int, text string"
    )
    assert classify_fetches(df).first().disposition == "ok"


def test_law_matches_arithmetic(spark):
    from ssb_sgis_spark.operators.triage import classify_fetches, fetch_log_df
    from ssb_sgis_spark.sources.pages import pages_df

    pages = pages_df(spark, SF_SMOKE).limit(3000)
    got = {r.uid: r.disposition
           for r in classify_fetches(fetch_log_df(pages)).collect()}
    seen = set()
    for p in pages.collect():
        u = p.uid
        exp = ("redirect" if u % 17 == 0 else
               "client_error" if u % 19 == 0 else
               "server_error" if u % 23 == 0 else
               "empty" if u % 29 == 0 else
               "soft_404" if u % 13 == 0 else "ok")
        seen.add(exp)
        assert got[u] == exp, u
    assert seen == {"redirect", "client_error", "server_error",
                    "empty", "soft_404", "ok"}
