"""Edit-distance similarity join (operators/editjoin.edit_distance_pairs)."""

from ssb_sgis_spark.operators.editjoin import (
    edit_distance_pairs,
    segment_scheme,
)


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = min(
                d[j] + 1,
                d[j - 1] + 1,
                prev + (a[i - 1] != b[j - 1]),
            )
            prev, d[j] = d[j], cur
    return d[n]


def _key(s, key_len):
    return (s[:key_len] + "\x00" * key_len)[:key_len]


def _brute(rows, k, key_len):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1 :]:
            a, b = (ia, ib) if ia < ib else (ib, ia)
            d = _lev(_key(sa, key_len), _key(sb, key_len))
            if d <= k:
                out.add((a, b, d))
    return out


def _run(spark, rows, k=2, key_len=24, **kw):
    df = spark.createDataFrame(rows, ["id", "s"])
    got = edit_distance_pairs(df, "id", "s", k=k, key_len=key_len, **kw)
    return {(r.a_id, r.b_id, r.dist) for r in got.collect()}


def test_segment_scheme_partitions_exactly(spark):
    for key_len in (24, 23, 10):
        for k in (1, 2, 3):
            segs = segment_scheme(key_len, k)
            assert len(segs) == k + 1
            assert segs[0][0] == 1
            assert sum(ln for _, ln in segs) == key_len
            for (p1, l1), (p2, _) in zip(segs, segs[1:]):
                assert p2 == p1 + l1


def test_matches_python_brute_force(spark):
    rows = [
        (0, "the quick brown fox jumps over"),
        (1, "the quick brown fox jumps over"),  # dist 0
        (2, "the quick brawn fox jumps over"),  # 1 sub
        (3, "xthe quick brown fox jumps ove"),  # front insert: all shifted
        (4, "the quick brown cat naps here!"),  # far
        (5, "he quick brown fox jumps overX"),  # front delete
        (6, "completely different content.."),
        (7, "the quick brown fox jumps ov"),  # shorter (padded)
    ]
    assert _run(spark, rows, bucket_cap=None) == _brute(rows, 2, 24)


def test_random_corpus_completeness(spark):
    # derandomized pseudo-random strings with planted near-pairs
    rows = []
    for i in range(60):
        base = "".join(
            "abcd"[(i * 7 + j * 13) % 4] for j in range(24)
        )
        rows.append((i, base))
        if i % 5 == 0:
            mutated = base[:3] + "z" + base[4:]  # one substitution
            rows.append((1000 + i, mutated))
    assert _run(spark, rows, bucket_cap=None) == _brute(rows, 2, 24)


def test_bucket_cap_drops_only_hot_segments(spark):
    # 50 rows all sharing every segment (identical strings) exceed a
    # cap of 10 on every segment bucket -> with the cap the pairs
    # vanish (documented trade); distinct near-pairs still survive
    hot = [(i, "a" * 24) for i in range(50)]
    pair = [(100, "b" * 23 + "c"), (101, "b" * 24)]
    got = _run(spark, hot + pair, bucket_cap=10)
    assert (100, 101, 1) in got
    assert not any(a < 50 and b < 50 for a, b, _ in got)
