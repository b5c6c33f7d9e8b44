"""Weighted exactly-k sampling (operators/sampling.sample_weighted)."""

import hashlib
import math

from ssb_sgis_spark.operators.sampling import sample_weighted


def _key(tie_id, w, seed="0"):
    h = hashlib.md5(f"{tie_id}:{seed}".encode()).hexdigest()[:8]
    u = (int(h, 16) + 1.0) / 4294967297.0
    return math.log(u) / float(w)


def _reference(rows, strata_i, k, w_i, id_i, seed="0"):
    by_stratum = {}
    for r in rows:
        if r[w_i] > 0:
            by_stratum.setdefault(r[strata_i], []).append(r)
    keep = set()
    for rs in by_stratum.values():
        rs.sort(key=lambda r: (-_key(r[id_i], r[w_i], seed), r[id_i]))
        keep.update(r[id_i] for r in rs[:k])
    return keep


def _run(spark, rows, k, seed="0", nsalts=32):
    df = spark.createDataFrame(rows, ["doc_id", "source", "w"])
    got = sample_weighted(df, "source", k, "w", "doc_id", seed, nsalts).collect()
    return {r.doc_id for r in got}


def test_matches_python_reference(spark):
    rows = [(i, f"s{i % 3}", 1 + (i * 7) % 20) for i in range(90)]
    assert _run(spark, rows, 5) == _reference(rows, 1, 5, 2, 0)


def test_zero_and_negative_weights_are_excluded(spark):
    rows = [(1, "a", 0), (2, "a", -3), (3, "a", 5), (4, "a", 1)]
    got = _run(spark, rows, 10)
    assert got == {3, 4}


def test_salted_path_equals_unsalted(spark):
    rows = [(i, "hot" if i < 80 else f"s{i}", 1 + i % 9) for i in range(100)]
    assert _run(spark, rows, 4, nsalts=32) == _run(spark, rows, 4, nsalts=1)


def test_heavier_rows_win_overwhelmingly(spark):
    # one row carries ~10^6 x the mass of the rest: across many seeds it
    # must essentially always be selected (A-ES inclusion ∝ weight)
    rows = [(i, "a", 1) for i in range(50)] + [(99, "a", 1_000_000)]
    hits = sum(
        99 in _run(spark, rows, 1, seed=str(s)) for s in range(8)
    )
    assert hits == 8


def test_small_stratum_keeps_all_rows(spark):
    rows = [(1, "tiny", 3), (2, "tiny", 9)]
    assert _run(spark, rows, 50) == {1, 2}
