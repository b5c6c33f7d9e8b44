"""Scale guards on the three paths the round-3 verdict flagged:

* ``cosine_pairs`` — exact O(n^2) variant must REFUSE above ``max_rows``
  and point at the LSH sibling (``operators/ann.py``).
* ``_broadcast_adjacency`` — Dijkstra-family queries collect the whole
  edge list to the driver (reference parity: igraph holds the graph in
  one process); past the edge ceiling that is a driver OOM, so it must
  fail loudly (``operators/network.py``).
* ``semdedup`` — within-cluster pairs are O(size^2); a degenerate
  clustering (everything in one cluster) must not revert to a global
  quadratic when ``cluster_cap`` is set (``operators/semdedup.py``).

Each guard has a fires-test AND a does-not-fire test so the default
path's behavior is pinned too.
"""

import numpy as np
import pytest

from tests.conftest import spark  # noqa: F401

from ssb_sgis_spark.operators import network as network_mod
from ssb_sgis_spark.operators.ann import cosine_pairs
from ssb_sgis_spark.operators.semdedup import semdedup


def _emb(spark, n, dim=4, seed=7):
    rng = np.random.default_rng(seed)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_cosine_pairs_refuses_above_max_rows(spark):
    emb = _emb(spark, 12)
    with pytest.raises(ValueError, match="cosine_pairs_lsh"):
        cosine_pairs(emb, 0.5, max_rows=10)


def test_cosine_pairs_max_rows_none_forces_exact(spark):
    emb = _emb(spark, 12)
    forced = cosine_pairs(emb, 0.5, max_rows=None).collect()
    under = cosine_pairs(emb, 0.5, max_rows=1_000).collect()
    assert sorted((r["a_id"], r["b_id"]) for r in forced) == sorted(
        (r["a_id"], r["b_id"]) for r in under
    )


def test_broadcast_adjacency_edge_ceiling(spark, monkeypatch):
    edges = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(10)],
        "source bigint, target bigint, weight double",
    )
    monkeypatch.setattr(network_mod, "_ADJACENCY_MAX_EDGES", 5)
    with pytest.raises(ValueError, match="exceeds 5 edges"):
        network_mod._broadcast_adjacency(edges, "weight")
    # at/under the ceiling the broadcast succeeds
    monkeypatch.setattr(network_mod, "_ADJACENCY_MAX_EDGES", 10)
    bc = network_mod._broadcast_adjacency(edges, "weight")
    assert len(bc.value[0]) == 10
    bc.unpersist()


def _degenerate(spark, n=40, dim=4):
    # every vector identical -> Lloyd puts ALL rows in one cluster and
    # every pair is an exact dup (cos = 1)
    rows = [(int(i), [1.0, 2.0, 3.0, 4.0]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_semdedup_cluster_cap_skips_megacluster(spark):
    df = _degenerate(spark)
    out = semdedup(df, dim=4, k_clusters=4, n_iter=2, cluster_cap=10).collect()
    assert len(out) == 40  # every row still present
    assert all(r["keep"] for r in out)  # oversized cluster: no pair work


def test_semdedup_cluster_cap_none_keeps_min_id_only(spark):
    df = _degenerate(spark)
    out = semdedup(df, dim=4, k_clusters=4, n_iter=2, cluster_cap=None).collect()
    keepers = sorted(r["vid"] for r in out if r["keep"])
    assert keepers == [0]  # min-id representative survives, 39 pruned


def test_semdedup_default_cap_matches_uncapped_on_real_data(spark):
    # non-degenerate data far below the default cap: guard is a no-op
    df = _emb(spark, 30, dim=6, seed=3)
    capped = semdedup(df, dim=6, k_clusters=3, n_iter=2).collect()
    uncapped = semdedup(
        df, dim=6, k_clusters=3, n_iter=2, cluster_cap=None
    ).collect()
    key = lambda r: (r["vid"], r["cid"], r["keep"])  # noqa: E731
    assert sorted(map(key, capped)) == sorted(map(key, uncapped))
