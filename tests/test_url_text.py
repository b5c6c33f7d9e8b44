"""URL/domain column functions and per-row repetition signals."""

from pyspark.sql import functions as F

from ssb_sgis_spark.functions.text import (
    distinct_token_count_col,
    top_bigram_count_col,
    token_count_col,
)
from ssb_sgis_spark.functions.url import (
    canonical_url_col,
    domain_col,
    host_col,
    path_col,
    path_depth_col,
    tld_col,
)
from tests.conftest import spark  # noqa: F401


def test_url_parts(spark):
    rows = (
        spark.createDataFrame(
            [
                ("https://site7.no/p/42",),
                ("https://A.b.Site7.no/p/42/?q=1#f",),
                ("notaurl",),
            ],
            "url string",
        )
        .select(
            host_col(F.col("url")).alias("host"),
            domain_col(F.col("url")).alias("dom"),
            tld_col(F.col("url")).alias("tld"),
            path_col(F.col("url")).alias("path"),
            path_depth_col(F.col("url")).alias("depth"),
            canonical_url_col(F.col("url")).alias("canon"),
        )
        .collect()
    )
    assert rows[0].asDict() == {
        "host": "site7.no", "dom": "site7.no", "tld": "no",
        "path": "/p/42", "depth": 2, "canon": "site7.no/p/42",
    }
    # query/fragment dropped, trailing slash stripped, host lowercased,
    # registered domain = last two labels
    assert rows[1]["dom"] == "Site7.no"
    assert rows[1]["canon"] == "a.b.site7.no/p/42"
    assert rows[1]["depth"] == 2
    # non-URL degrades to empty host / depth 0, not an error
    assert rows[2]["host"] == "" and rows[2]["depth"] == 0


def test_repetition_fold_matches_groupby(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a c"),        # bigrams: ab ba ab ba ac -> top 2
            (2, "x x x x"),            # xx xx xx -> top 3
            (3, "solo"),               # no bigrams -> 0
            (4, ""),                   # split('') = [''] -> 0
            (5, "p q"),                # one bigram -> 1
        ],
        "doc_id long, text string",
    )
    t = F.col("text")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            token_count_col(t).alias("n"),
            distinct_token_count_col(t).alias("d"),
            top_bigram_count_col(t).alias("top"),
        ).collect()
    }
    assert (got[1]["n"], got[1]["d"], got[1]["top"]) == (6, 3, 2)
    assert got[2]["top"] == 3
    assert got[3]["top"] == 0
    assert got[4]["top"] == 0
    assert got[5]["top"] == 1

    # the per-row fold must equal the classic explode+groupBy answer
    bg = df.select(
        "doc_id",
        F.explode_outer(
            F.zip_with(
                F.slice(F.split(t, " "), F.lit(1), F.size(F.split(t, " ")) - 1),
                F.slice(F.split(t, " "), F.lit(2), F.size(F.split(t, " ")) - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("b"),
    )
    ref = {
        r["doc_id"]: r["m"]
        for r in bg.groupBy("doc_id", "b")
        .count()
        .groupBy("doc_id")
        .agg(F.max(F.when(F.col("b").isNotNull(), F.col("count")).otherwise(0)).alias("m"))
        .collect()
    }
    for k, r in got.items():
        assert r["top"] == ref[k], k


def test_bpe_token_count_known_values(spark):
    """BPE-ish pre-tokenizer: contractions split, punctuation runs are one
    token, leading spaces attach to the following word."""
    from ssb_sgis_spark.functions.text import bpe_token_count_col

    rows = [
        (1, "it's a 42-piece set!!"),   # it|'s| a| 42|-|piece| set|!!
        (2, ""),
        (3, "plain words here"),        # plain| words| here
        (4, "  double  spaced  "),      # 2sp|double| |spaced| |sp... count below
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe_token_count_col(F.col("text")).alias("n")
        ).collect()
    }
    import re
    from ssb_sgis_spark.functions.text import BPE_TOKEN_PATTERN

    for doc_id, text in rows:
        assert got[doc_id] == len(re.findall(BPE_TOKEN_PATTERN, text)), text
    assert got[1] == 8 and got[2] == 0 and got[3] == 3


def test_pmi_collocations_closed_form(spark):
    """Tiny corpus with one overwhelming collocation: hand-computed PMI
    in micro-nats, deterministic ordering, min_count pruning."""
    import math

    from ssb_sgis_spark.functions.text import pmi_collocations

    # "new york" appears 4x; "a b" 4x but both words are everywhere
    docs = [
        (0, "new york a b"),
        (1, "new york a b"),
        (2, "new york b a"),
        (3, "new york a b"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = pmi_collocations(df, min_count=2, top_k=10).collect()
    got = {(r.w1, r.w2): (r.c_xy, r.pmi_micro) for r in rows}
    # bigram space: per doc 3 bigrams -> N=12
    n = 12
    c = {}
    for _, t in docs:
        w = t.split()
        for i in range(len(w) - 1):
            c[(w[i], w[i + 1])] = c.get((w[i], w[i + 1]), 0) + 1
    cx = {}
    cy = {}
    for (a, b), v in c.items():
        cx[a] = cx.get(a, 0) + v
        cy[b] = cy.get(b, 0) + v
    for pair, v in c.items():
        if v < 2:
            assert pair not in got
            continue
        want = math.floor(1e6 * math.log(v * n / (cx[pair[0]] * cy[pair[1]])))
        assert got[pair] == (v, want), pair
    # (a,b) and (new,york) tie at PMI = ln(3); tie-break is (w1, w2) asc
    top = math.floor(1e6 * math.log(3))
    assert (rows[0].w1, rows[0].w2, rows[0].pmi_micro) == ("a", "b", top)
    assert (rows[1].w1, rows[1].w2, rows[1].pmi_micro) == ("new", "york", top)
