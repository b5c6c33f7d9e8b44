"""Interpolated bigram LM: exact toy-corpus check vs a Python oracle."""

import math
from collections import Counter

from ssb_sgis_spark.operators.quality import bigram_nll
from tests.conftest import spark  # noqa: F401

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat"),
    (3, "dog"),  # single token: no bigrams, drops out
    (4, "on the mat the cat"),
    (5, "mat mat mat"),
]


def _brute():
    bigs = {}
    for did, text in DOCS:
        t = text.split(" ")
        bigs[did] = Counter(zip(t, t[1:]))
    c12 = Counter()
    for c in bigs.values():
        c12.update(c)
    c1, c2, n = Counter(), Counter(), 0
    for (w1, w2), c in c12.items():
        c1[w1] += c
        c2[w2] += c
        n += c
    out = {}
    for did, c in bigs.items():
        if not c:
            continue
        tot_nll = 0
        n_big = 0
        for (w1, w2), cnt in c.items():
            num = 9 * c12[(w1, w2)] * n + c1[w1] * c2[w2]
            den = 10 * c1[w1] * n
            tot_nll += cnt * math.floor(-math.log(num / den) * 1e6)
            n_big += cnt
        out[did] = (tot_nll, n_big)
    return out

def test_bigram_nll_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.nll_micro, r.n_big)
        for r in bigram_nll(df).collect()
    }
    assert got == _brute()
    assert 3 not in got  # single-token doc emits no bigrams


def test_bigram_nll_separates_repetitive_from_shuffled(spark):
    """A doc made of the corpus's dominant transitions scores a lower
    per-bigram NLL than one with the same unigrams in a rare order."""
    base = [(i, "a b c d " * 5) for i in range(20)]
    probe = [(100, "a b c d a b c d"), (101, "d c b a d c b a")]
    df = spark.createDataFrame(base + probe, "doc_id long, text string")
    rows = {r.doc_id: r.nll_micro / r.n_big for r in bigram_nll(df).collect()}
    assert rows[100] < rows[101]
