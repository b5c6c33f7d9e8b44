"""Winnowing fingerprints (operators/winnow.py) vs a brute-force
reference implementation of the SIGMOD'03 selection rule."""

import hashlib

from ssb_sgis_spark.operators.winnow import winnow_fingerprints


def _ref(text, k=3, w=4):
    toks = text.split(" ")
    grams = [
        (i + 1, hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:16])
        for i in range(len(toks) - k + 1)
    ]
    if not grams:
        return set()
    n = len(grams)
    picked = set()
    for s in range(1, max(1, n - w + 1) + 1):
        window = grams[s - 1 : s - 1 + w]
        mh = min(h for _, h in window)
        pos = max(p for p, h in window if h == mh)  # rightmost min
        picked.add((pos, mh))
    return picked


def test_winnow_matches_bruteforce(spark):
    texts = [
        "a b c d e f g h i j k l m",
        "the cat sat on the mat the cat sat on the mat",  # repeats -> ties
        "x y z",        # exactly one gram (n < w: single partial window)
        "too short",    # < k tokens -> no fingerprints
        "p q r s t",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    want = {i: _ref(t) for i, t in enumerate(texts) if _ref(t)}
    assert got == want


def test_winnow_guarantee_shared_substring_shares_fp(spark):
    """Any shared run of >= w + k - 1 tokens must share at least one
    selected fingerprint between the two documents."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w + k - 1
    d1 = "intro words here " + shared + " tail one"
    d2 = "completely different lead " + shared + " other ending words"
    df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    rows = winnow_fingerprints(df).collect()
    fps1 = {r.fp for r in rows if r.doc_id == 1}
    fps2 = {r.fp for r in rows if r.doc_id == 2}
    assert fps1 & fps2, "guaranteed shared fingerprint missing"
