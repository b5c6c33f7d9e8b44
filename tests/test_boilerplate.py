"""Host-template removal: rule exactness, min_pages gate, law oracle."""

from tests.conftest import SF_SMOKE


def _mk(spark, rows):
    return spark.createDataFrame(rows, "uid long, host string, text string")


def test_template_rule_and_strip(spark):
    from ssb_sgis_spark.operators.boilerplate import remove_boilerplate

    # host A: 5 pages, nav on all 5 (template at frac=0.8, min_pages=5),
    # promo on 3/5 (60% < 80% -> kept), unique line kept.
    rows = [
        (i, "A", f"nav A\npage {i}" + ("\npromo A" if i < 3 else "")) for i in range(5)
    ]
    got = {
        r.uid: r.text
        for r in remove_boilerplate(_mk(spark, rows), min_pages=5, id_col="uid").collect()
    }
    for i in range(5):
        assert got[i] == f"page {i}" + ("\npromo A" if i < 3 else "")


def test_exact_boundary_is_integer_exact(spark):
    from ssb_sgis_spark.operators.boilerplate import host_template_lines

    # 5 pages, line on exactly 4 -> 4*5 >= 4*5 at frac=0.8: TEMPLATE.
    rows = [(i, "A", ("shared\n" if i < 4 else "") + f"u{i}") for i in range(5)]
    tpl = host_template_lines(_mk(spark, rows), min_pages=5, id_col="uid")
    assert tpl.count() == 1
    # on exactly 3 of 5 -> 3*5 < 4*5: not template.
    rows = [(i, "A", ("shared\n" if i < 3 else "") + f"u{i}") for i in range(5)]
    tpl = host_template_lines(_mk(spark, rows), min_pages=5, id_col="uid")
    assert tpl.count() == 0


def test_min_pages_gate(spark):
    from ssb_sgis_spark.operators.boilerplate import remove_boilerplate

    rows = [(i, "B", f"nav B\npage {i}") for i in range(4)]  # 4 < min_pages=10
    got = remove_boilerplate(_mk(spark, rows), id_col="uid").collect()
    assert all(r.text.startswith("nav B\n") for r in got)  # nothing stripped


def test_repeated_line_within_page_counts_once(spark):
    from ssb_sgis_spark.operators.boilerplate import host_template_lines

    # "dup" appears twice in ONE page and nowhere else: 1 page of 5.
    rows = [(0, "A", "dup\ndup\nu0")] + [(i, "A", f"u{i}") for i in range(1, 5)]
    tpl = host_template_lines(_mk(spark, rows), min_pages=5, id_col="uid")
    assert tpl.count() == 0


def test_law_corpus_matches_closed_form(spark):
    """remove_boilerplate on the synthetic law == per-host closed form:
    nav/footer stripped (host-constant), unique + promo kept (promo is
    on ~half the host's pages)."""
    from ssb_sgis_spark.operators.boilerplate import (
        boilerplate_pages_df,
        remove_boilerplate,
    )
    from ssb_sgis_spark.sources.pages import pages_df

    # keep a handful of hosts so SF_SMOKE still has >= min_pages each
    pages = pages_df(spark, SF_SMOKE).filter("uid % 1000 < 3")
    df = boilerplate_pages_df(pages)
    per_host = {r.host: (r.n, r.np_) for r in
                df.selectExpr("host", "cast(uid % 2 = 0 as int) as p").groupBy("host")
                .agg({"*": "count", "p": "sum"})
                .toDF("host", "np_", "n").collect()}
    min_pages = 3
    got = {r.uid: r.text for r in
           remove_boilerplate(df, min_pages=min_pages, id_col="uid").collect()}
    stripped_hosts = 0
    for p in df.select("uid", "host").collect():
        n, n_promo = per_host[p.host]
        gated = n >= min_pages
        removed_promo = gated and 5 * n_promo >= 4 * n
        exp = f"page {p.uid} unikt innhold"
        if p.uid % 2 == 0 and not removed_promo:
            exp += f"\npromo {p.host} tilbud"
        if not gated:
            exp = f"nav {p.host} meny\n" + exp + f"\nfooter {p.host} kontakt"
        else:
            stripped_hosts += 1
        assert got[p.uid] == exp, (p.uid, p.host)
    assert stripped_hosts > 0  # the interesting branch actually ran
