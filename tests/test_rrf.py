"""Reciprocal-rank fusion (operators/search.rrf_fuse)."""

from ssb_sgis_spark.operators.search import RRF_SCALE, rrf_fuse


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["query_id", "doc_id", "rank"])


def _run(spark, lists, **kw):
    got = rrf_fuse([_mk(spark, rows) for rows in lists], **kw).collect()
    return {
        (r.query_id, r.fused_rank): (r.doc_id, r.rrf_micro) for r in got
    }


def _c(k_rrf, rank):
    return RRF_SCALE // (k_rrf + rank)


def test_doc_in_both_lists_beats_single_list_winners(spark):
    # doc 7 is rank 2 in both lists; docs 1 and 2 are rank 1 in one list
    # each.  RRF: 2/(60+2) > 1/(60+1), so the consensus doc wins.
    lex = [(0, 1, 1), (0, 7, 2)]
    vec = [(0, 2, 1), (0, 7, 2)]
    got = _run(spark, [lex, vec], k_rrf=60, out_k=3)
    assert got[(0, 1)] == (7, 2 * _c(60, 2))
    # docs 1 and 2 tie on score; doc id breaks the tie
    assert got[(0, 2)] == (1, _c(60, 1))
    assert got[(0, 3)] == (2, _c(60, 1))


def test_out_k_truncates_and_scores_are_exact_integers(spark):
    lex = [(5, d, r) for r, d in enumerate([10, 11, 12, 13], start=1)]
    got = _run(spark, [lex], k_rrf=60, out_k=2)
    assert set(got) == {(5, 1), (5, 2)}
    assert got[(5, 1)] == (10, RRF_SCALE // 61)


def test_queries_fuse_independently(spark):
    lex = [(0, 1, 1), (9, 2, 1)]
    vec = [(9, 2, 1)]
    got = _run(spark, [lex, vec])
    assert got[(0, 1)] == (1, _c(60, 1))
    assert got[(9, 1)] == (2, 2 * _c(60, 1))


def test_three_way_fusion_sums_all_contributions(spark):
    lists = [[(1, 42, 3)], [(1, 42, 1)], [(1, 42, 10)]]
    got = _run(spark, lists)
    assert got[(1, 1)] == (42, _c(60, 3) + _c(60, 1) + _c(60, 10))
