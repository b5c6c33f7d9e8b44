"""Redirect resolution: pointer doubling vs closed form, cycles, caps."""

from tests.conftest import SF_SMOKE


def test_resolve_small_chain(spark):
    from ssb_sgis_spark.operators.redirects import resolve_redirects

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "final"), ("x", "final")],
        "src string, dst string",
    )
    got = {r.src: (r.final, r.hops, r.is_cycle) for r in resolve_redirects(edges).collect()}
    assert got == {
        "a": ("final", 3, False),
        "b": ("final", 2, False),
        "c": ("final", 1, False),
        "x": ("final", 1, False),
    }


def test_resolve_cycle_flagged(spark):
    from ssb_sgis_spark.operators.redirects import resolve_redirects

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("in", "a"), ("ok", "done")],
        "src string, dst string",
    )
    got = {r.src: (r.final, r.is_cycle) for r in resolve_redirects(edges, max_hops=16).collect()}
    assert got["ok"] == ("done", False)
    for n in ("a", "b", "c", "in"):
        assert got[n] == (None, True)


def test_resolve_matches_law_closed_form(spark):
    """resolve_redirects (join-based doubling) ≡ the closed-form law on
    the synthetic capture log: final = /p/{uid}, hops = c − k."""
    from ssb_sgis_spark.operators.redirects import (
        redirect_captures_df,
        resolve_redirects,
    )
    from ssb_sgis_spark.sources.pages import pages_df

    pages = pages_df(spark, SF_SMOKE).filter("uid % 5 = 0").limit(400)
    edges = redirect_captures_df(pages)
    got = {
        r.src: (r.final, r.hops, r.is_cycle)
        for r in resolve_redirects(edges).collect()
    }
    for p in pages.collect():
        c = 1 + p.uid % 13
        site = f"https://site{p.uid % 1000}.no"
        for k in range(c):
            assert got[f"{site}/r/{p.uid}/{k}"] == (
                f"{site}/p/{p.uid}",
                c - k,
                False,
            )


def test_local_pass_equals_pure_doubling(spark):
    """The bucket-local compression is a pure performance choice: with
    a PATHOLOGICAL bucket key (everything straddles buckets) the
    residue loop still produces the identical answer."""
    from pyspark.sql import functions as F

    from ssb_sgis_spark.operators.redirects import (
        redirect_captures_df,
        resolve_redirects,
    )
    from ssb_sgis_spark.sources.pages import pages_df

    edges = redirect_captures_df(pages_df(spark, SF_SMOKE).limit(300))
    base = {
        r.src: (r.final, r.hops, r.is_cycle)
        for r in resolve_redirects(edges, local_buckets=None).collect()
    }
    local = {
        r.src: (r.final, r.hops, r.is_cycle)
        for r in resolve_redirects(edges).collect()
    }
    # worst-case bucketing: random scatter, chains cross buckets a lot
    scatter = {
        r.src: (r.final, r.hops, r.is_cycle)
        for r in resolve_redirects(
            edges, local_buckets=7, bucket_expr=F.xxhash64("src")
        ).collect()
    }
    assert base == local == scatter


def test_cycle_flagged_local_path(spark):
    """In-bucket cycles are flagged through the compression pass too."""
    from ssb_sgis_spark.operators.redirects import resolve_redirects

    edges = spark.createDataFrame(
        [("h/a", "h/b"), ("h/b", "h/c"), ("h/c", "h/a"), ("h/in", "h/a"),
         ("h/ok", "h/done")],
        "src string, dst string",
    )
    got = {r.src: (r.final, r.is_cycle)
           for r in resolve_redirects(edges, max_hops=16).collect()}
    assert got["h/ok"] == ("h/done", False)
    for n in ("h/a", "h/b", "h/c", "h/in"):
        assert got[n] == (None, True)


def test_long_chain_logarithmic_rounds(spark):
    """A 40-hop chain resolves (doubling would need 6 rounds, not 40
    sequential passes) and the hop counts are exact."""
    from ssb_sgis_spark.operators.redirects import resolve_redirects

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(40)], "src string, dst string"
    )
    got = {r.src: r.hops for r in resolve_redirects(edges).collect()}
    assert got == {f"n{i}": 40 - i for i in range(40)}
