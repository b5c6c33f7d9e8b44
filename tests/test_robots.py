"""RFC 9309 robots parsing + decision semantics."""

from pyspark.sql import functions as F

from ssb_sgis_spark.operators.robots import parse_robots_text


def _rules(txt, agent="sgisbot"):
    return {(r, a) for r, a, *_ in parse_robots_text(txt, agent)}


def test_group_selection_and_stacking():
    txt = (
        "User-agent: alphabot\nUser-agent: sgisbot\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /b\n"
    )
    # stacked header: sgisbot shares alphabot's group; * is NOT merged in
    assert _rules(txt) == {("/a", False)}
    assert _rules(txt, "alphabot") == {("/a", False)}
    assert _rules(txt, "unknownbot") == {("/b", False)}


def test_exact_token_beats_star_regardless_of_order():
    txt = "User-agent: *\nDisallow: /x\n\nUser-agent: sgisbot\nAllow: /x\n"
    assert _rules(txt) == {("/x", True)}


def test_case_comments_empty_patterns():
    txt = (
        "# header comment\n"
        "USER-AGENT: SGISBOT   # trailing\n"
        "DISALLOW: /secret\n"
        "Disallow:\n"  # empty pattern: ignored
        "Allow: /secret/ok # inline comment\n"
    )
    assert _rules(txt) == {("/secret", False), ("/secret/ok", True)}


def test_no_groups_allows_all():
    assert parse_robots_text("Sitemap: https://x/s.xml\n", "sgisbot") == []


def test_rule_before_any_group_is_dropped():
    assert parse_robots_text("Disallow: /\nUser-agent: *\nAllow: /a\n", "sgisbot") == [
        ("/a", True, 2, False, "^/a")
    ]


def test_wildcard_and_anchor_translation():
    rules = parse_robots_text(
        "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*x\n", "sgisbot"
    )
    by = {r[0]: r for r in rules}
    assert by["/*.pdf$"][3] is True and by["/*.pdf$"][4] == r"^/.*\.pdf$"
    assert by["/tmp*x"][4] == "^/tmp.*x"


def test_apply_longest_match_allow_ties(spark):
    from ssb_sgis_spark.operators.robots import apply_robots

    rules = spark.createDataFrame(
        [
            ("h.no", "/p/", False, 3, False, "^/p/"),
            ("h.no", "/p/7", True, 4, False, "^/p/7"),
            ("h.no", "/*.pdf$", False, 7, True, r"^/.*\.pdf$"),
        ],
        "host string, rule string, allow boolean, spec int, has_wild boolean, rx string",
    )
    pages = spark.createDataFrame(
        [
            (1, "https://h.no/p/123"),      # /p/ disallow
            (2, "https://h.no/p/77"),        # /p/7 re-allow (longest match)
            (3, "https://h.no/other"),       # no rule matches
            (4, "https://h.no/a/file.pdf"),  # wildcard + anchor
            (5, "https://h.no/a/file.pdfx"), # anchor must NOT match
            (6, "https://nother.no/p/1"),    # host without rules
        ],
        "uid long, url string",
    )
    got = {r.uid: r.allowed for r in apply_robots(pages, rules).collect()}
    assert got == {1: False, 2: True, 3: True, 4: False, 5: True, 6: True}


def test_end_to_end_law(spark):
    """Synthesized robots → parse → apply over a small page set matches
    the law: only site%3==0 restricts /p/, re-allowing uid strings that
    start with 7."""
    from __spark_entry__ import pages_df
    from ssb_sgis_spark.operators.robots import (
        apply_robots,
        parse_robots,
        robots_txt_df,
    )
    from tests.conftest import SF_SMOKE

    pages = pages_df(spark, SF_SMOKE).select("uid", "url").limit(400)
    rules = parse_robots(robots_txt_df(spark))
    got = apply_robots(pages, rules).collect()
    assert len(got) == 400
    for r in got:
        s = r.uid % 1000
        expect = str(r.uid).startswith("7") if s % 3 == 0 else True
        assert r.allowed == expect, (r.uid, s, r.allowed)
