"""Integer-exact batch perceptron (operators/classifier)."""

import hashlib
from collections import Counter

from pyspark.sql import functions as F

from ssb_sgis_spark.operators.classifier import BIAS, perceptron_scores


def _bucket(tok):
    return hashlib.md5(tok.encode()).hexdigest()[:2]


def _reference(docs, labels, n_iter):
    """Plain-python replay of the batch rule."""
    feats = {}
    for d, text in docs.items():
        c = Counter(_bucket(t) for t in text.split(" "))
        c[BIAS] += 1
        feats[d] = c
    w = Counter()
    for _ in range(n_iter):
        mis = []
        for d in docs:
            s = sum(w[b] * x for b, x in feats[d].items())
            pred = 1 if s > 0 else -1
            if pred != labels[d]:
                mis.append(d)
        for d in mis:
            for b, x in feats[d].items():
                w[b] += labels[d] * x
    out = {}
    for d in docs:
        s = sum(w[b] * x for b, x in feats[d].items())
        out[d] = (s, 1 if s > 0 else -1)
    return out


def _train(spark, docs, labels, n_iter):
    rows = [(d, t, labels[d]) for d, t in docs.items()]
    df = spark.createDataFrame(rows, ["doc_id", "text", "y_in"])
    got = perceptron_scores(df, F.col("y_in"), n_iter=n_iter).collect()
    return {r.doc_id: (r.score, r.pred, r.y) for r in got}


def test_separable_corpus_learned(spark):
    docs, labels = {}, {}
    for i in range(30):
        good = i % 2 == 0
        word = "excellent prose paragraph" if good else "spam casino pills"
        docs[i] = f"{word} filler{i % 5} common token"
        labels[i] = 1 if good else -1
    got = _train(spark, docs, labels, n_iter=3)
    # linearly separable by construction -> perfect training accuracy
    assert all(pred == labels[d] for d, (s, pred, y) in got.items())


def test_matches_python_reference(spark):
    docs, labels = {}, {}
    for i in range(60):
        words = [f"w{(i * 7 + k) % 23}" for k in range(1 + i % 6)]
        docs[i] = " ".join(words)
        labels[i] = 1 if (i * 13) % 3 == 0 else -1
    for n_iter in (1, 3):
        ref = _reference(docs, labels, n_iter)
        got = _train(spark, docs, labels, n_iter)
        assert {d: v[:2] for d, v in got.items()} == ref


def test_all_one_class_converges_round_one(spark):
    docs = {i: f"tok{i % 4}" for i in range(10)}
    labels = {i: -1 for i in range(10)}
    got = _train(spark, docs, labels, n_iter=2)
    # round 1: all scores 0 -> pred -1 == y -> no update; weights stay 0
    assert all(s == 0 and pred == -1 for s, pred, y in got.values())
