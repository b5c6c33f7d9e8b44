"""BPE merge training (operators/bpe.py) vs a pure-Python reference."""

import pytest
from tests.conftest import spark  # noqa: F401

from ssb_sgis_spark.operators.bpe import bpe_merges


def _bpe_ref(texts, n_merges):
    """Classic histogram-based BPE trainer: count adjacent pairs over
    the word histogram, merge the (count DESC, pair ASC) argmax with a
    greedy leftmost-non-overlapping pass, repeat."""
    hist = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                hist[w] = hist.get(w, 0) + 1
    state = {w: list(w) for w in hist}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + hist[w]
        if not counts:
            return merges
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, c))
        for w, syms in state.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            state[w] = out
    return merges


def test_bpe_merges_match_python_reference(spark):
    texts = [
        "low low low lower lowest",
        "new newer newest low lowly",
        "wide wider widest new news",
    ] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_merges(df, 10).orderBy("merge_rank").collect()
    ]
    assert got == _bpe_ref(texts, 10)
    # first merge on this corpus: 'l'+'o' or 'o'+'w' at count 21 each —
    # lexicographic tie-break picks ('l', 'o')
    assert got[0][1:3] == ("l", "o")


def test_bpe_overlapping_runs_merge_greedy_leftmost(spark):
    """'aaaa' with merge (a,a) must fold to [aa, aa], never [a, aa, a]."""
    df = spark.createDataFrame([("aaaa aaaa b",)], "text string")
    out = bpe_merges(df, 2).orderBy("merge_rank").collect()
    # round 1: (a, a) appears 3x per word x 2 words = 6
    assert (out[0].left_sym, out[0].right_sym, out[0].pair_count) == ("a", "a", 6)
    # after greedy fold each word is [aa, aa]: round 2 merges (aa, aa) x2
    assert (out[1].left_sym, out[1].right_sym, out[1].pair_count) == (
        "aa", "aa", 2,
    )


def test_bpe_raises_when_exhausted(spark):
    df = spark.createDataFrame([("ab ab",)], "text string")
    with pytest.raises(ValueError, match="exhausted"):
        bpe_merges(df, 5)  # only 1 possible merge exists


def test_bpe_token_stats_match_python_encode(spark):
    """Per-doc (n_words, n_bpe_tokens) equals a full Python re-derivation:
    train with the reference trainer, greedily fold every word, count."""
    from ssb_sgis_spark.operators.bpe import bpe_token_stats

    texts = [
        "low low low lower lowest",
        "new newer newest low lowly",
        "",  # no words -> (0, 0)
        "wide wider widest new news",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    merges = _bpe_ref(texts, 6)

    def encode_len(word):
        syms = list(word)
        for _, a, b, _c in merges:
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        return len(syms)

    want = {}
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        want[i] = (len(words), sum(encode_len(w) for w in words))

    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_token_stats(df, 6).collect()
    }
    assert got == want
    assert got[2] == (0, 0)


# ---------------------------------------------------------------------------
# Batched merges (round 4): top-M symbol-disjoint picks per Spark round
# ---------------------------------------------------------------------------

_PARITY_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "how vexingly quick daft zebras jump",
    "the five boxing wizards jump quickly",
    "sphinx of black quartz judge my vow",
    "the jay pig fox zebra and my wolves quack",
] * 5


def test_bpe_batched_parity_with_sequential(spark):
    """batch=6 must produce the identical merge table (ranks, pairs AND
    counts) as the exact sequential loop on this corpus."""
    df = spark.createDataFrame([(t,) for t in _PARITY_TEXTS], "text string")
    seq = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_merges(df, 24).orderBy("merge_rank").collect()
    ]
    bat = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_merges(df, 24, batch=6).orderBy("merge_rank").collect()
    ]
    assert bat == seq
    assert seq == _bpe_ref(_PARITY_TEXTS, 24)


def test_bpe_batched_round_reduction(spark):
    """The whole point: driver round-trips collapse by ~the average
    batch fill.  On this corpus 24 merges must take <= 8 rounds."""
    from ssb_sgis_spark.operators.bpe import _train

    df = spark.createDataFrame([(t,) for t in _PARITY_TEXTS], "text string")
    _, _, rounds_seq = _train(df, 12, "text", batch=1)
    assert rounds_seq == 12
    merges, _, rounds = _train(df, 24, "text", batch=8)
    assert len(merges) == 24
    assert rounds <= 8


def test_bpe_greedy_strategy_more_rounds_collapsed(spark):
    """strategy='greedy' (skip past conflicts) fills batches fuller than
    'prefix'.  It is an order-heuristic (tie reorders can cascade into a
    different — equally-frequent — merge inventory), so assert only its
    contract: full merge count, big round collapse, the unambiguous
    first argmax, and within-batch symbol-disjointness."""
    from ssb_sgis_spark.operators.bpe import _train

    df = spark.createDataFrame([(t,) for t in _PARITY_TEXTS], "text string")
    seq, _, _ = _train(df, 8, "text", batch=1)
    grd, _, rounds_g = _train(df, 24, "text", batch=8, strategy="greedy")
    assert len(grd) == 24
    assert rounds_g <= 6  # fuller batches than the prefix rule's 8
    assert grd[0][1:] == seq[0][1:]  # rank-1 argmax is strategy-free
    assert [r for r, *_ in grd] == list(range(1, 25))
    assert all(c > 0 for *_, c in grd)
    with pytest.raises(ValueError, match="strategy"):
        _train(df, 2, "text", batch=2, strategy="bogus")


def test_bpe_batched_overlap_skipped_not_merged_wrong(spark):
    """A batch never contains two pairs sharing a symbol — 'aaaa' at
    batch=4 must still fold greedily exactly like sequential."""
    df = spark.createDataFrame([("aaaa aaaa b",)], "text string")
    out = bpe_merges(df, 2, batch=4).orderBy("merge_rank").collect()
    assert (out[0].left_sym, out[0].right_sym, out[0].pair_count) == ("a", "a", 6)
    assert (out[1].left_sym, out[1].right_sym, out[1].pair_count) == (
        "aa", "aa", 2,
    )
