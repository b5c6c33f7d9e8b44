"""Overlapping token-window chunking (operators/chunking)."""

import pytest

from ssb_sgis_spark.operators.chunking import chunk_documents


def _chunks(spark, text, c, v):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = chunk_documents(df, chunk_tokens=c, overlap=v).collect()
    return sorted((r.chunk_id, r.n_tokens, r.chunk_text) for r in rows)


def test_short_doc_single_window(spark):
    got = _chunks(spark, "a b c", 8, 2)
    assert got == [(0, 3, "a b c")]


def test_exact_fit_single_window(spark):
    toks = " ".join(str(i) for i in range(8))
    assert _chunks(spark, toks, 8, 2) == [(0, 8, toks)]


def test_overlap_and_coverage(spark):
    toks = [str(i) for i in range(10)]
    got = _chunks(spark, " ".join(toks), 4, 2)
    # stride 2: starts 0,2,4,6 -> last window [6..9] reaches the end
    assert [g[2].split(" ") for g in got] == [
        toks[0:4],
        toks[2:6],
        toks[4:8],
        toks[6:10],
    ]
    assert all(g[1] == 4 for g in got)


def test_ragged_tail(spark):
    toks = [str(i) for i in range(9)]
    got = _chunks(spark, " ".join(toks), 4, 1)
    # stride 3: starts 0,3,6 -> tail window has 3 tokens
    assert [g[1] for g in got] == [4, 4, 3]
    assert got[-1][2] == "6 7 8"


def test_every_token_covered(spark):
    toks = [str(i) for i in range(57)]
    got = _chunks(spark, " ".join(toks), 8, 3)
    covered = set()
    for _, _, text in got:
        covered.update(text.split(" "))
    assert covered == set(toks)


def test_overlap_guard():
    with pytest.raises(ValueError):
        chunk_documents(None, chunk_tokens=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(None, chunk_tokens=8, overlap=-1)
