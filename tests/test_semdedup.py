"""SemDeDup: integer k-means + within-cluster near-dup pruning
(operators/semdedup.py) — full numpy re-derivation parity."""

import numpy as np
from tests.conftest import spark  # noqa: F401

from ssb_sgis_spark.operators.semdedup import semdedup

DIM = 8
RNG = np.random.default_rng(11)


def _quantize(v: np.ndarray) -> np.ndarray:
    """Replicate quantize_int8: round-HALF-UP (away from zero — Spark
    F.round / DuckDB round), not numpy's banker's rounding."""
    n = np.linalg.norm(v.astype(np.float64), axis=1, keepdims=True)
    scaled = np.divide(127.0 * v, n, out=np.zeros_like(v, dtype=np.float64),
                       where=n != 0)
    return (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)


def _semdedup_np(ids, vecs, k, n_iter, tau):
    q = _quantize(vecs)
    order = np.argsort(ids)
    seeds = order[:k]
    cids = ids[seeds]
    n = np.ones(k, dtype=np.int64)
    s = q[seeds].copy()
    assign = None
    for r in range(n_iter):
        # dist to centroid c scaled by n^2: exact-int numerator / double
        num = ((q[:, None, :] * n[None, :, None] - s[None, :, :]) ** 2).sum(
            axis=2
        )
        dist = num.astype(np.float64) / (n * n).astype(np.float64)[None, :]
        # argmin with tie -> lowest centroid id
        tied = dist == dist.min(axis=1, keepdims=True)
        cid_m = np.where(
            tied, np.broadcast_to(cids, dist.shape), np.iinfo(np.int64).max
        )
        assign = cid_m.min(axis=1)
        if r < n_iter - 1:
            new_cids, new_n, new_s = [], [], []
            for c in cids:
                mask = assign == c
                if mask.sum() == 0:
                    continue  # empty cluster drops out (both engines)
                new_cids.append(c)
                new_n.append(mask.sum())
                new_s.append(q[mask].sum(axis=0))
            cids = np.array(new_cids)
            n = np.array(new_n, dtype=np.int64)
            s = np.array(new_s, dtype=np.int64)
    # dup rule
    t_num, t_den = tau
    nrm2 = (q * q).sum(axis=1)
    keep = {}
    for i, vid in enumerate(ids):
        keep[vid] = True
        for j, vid2 in enumerate(ids):
            if vid2 >= vid or assign[j] != assign[i]:
                continue
            dot = int((q[i] * q[j]).sum())
            if dot > 0 and t_den * t_den * dot * dot >= (
                t_num * t_num * int(nrm2[i]) * int(nrm2[j])
            ):
                keep[vid] = False
                break
    return {int(v): (int(c), keep[v]) for v, c in zip(ids, assign)}


def test_semdedup_matches_numpy_rederivation(spark):
    ids = np.arange(100, dtype=np.int64)
    RNG.shuffle(ids)
    # three loose gaussian blobs + a few exact-duplicate directions
    centers = RNG.normal(size=(3, DIM)) * 5
    vecs = np.vstack(
        [centers[i % 3] + RNG.normal(size=DIM) for i in range(97)]
        + [centers[0], centers[0] * 2.0, centers[1]]  # colinear dups
    )
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<float>",
    )
    # float32 storage: re-derive from the SAME float32 values spark sees
    want = _semdedup_np(ids, vecs.astype(np.float32).astype(np.float64),
                        k=4, n_iter=2, tau=(4, 5))
    out = semdedup(df, DIM, k_clusters=4, n_iter=2, tau=(4, 5)).collect()
    got = {r.vid: (r.cid, r.keep) for r in out}
    assert got == want
    # the colinear duplicates (cos == 1 in quantized space) cannot all
    # survive — at least one keep=False exists
    assert sum(1 for _, k in got.values() if not k) >= 1
    # min id of every cluster always survives
    by_cid = {}
    for vid, (cid, k) in got.items():
        by_cid.setdefault(cid, []).append((vid, k))
    for cid, rows in by_cid.items():
        assert dict(rows)[min(v for v, _ in rows)] is True


def test_semdedup_keep_all_when_tau_above_max(spark):
    """tau > 1 is unreachable for any cosine: every row keeps."""
    vecs = RNG.normal(size=(30, DIM))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = semdedup(df, DIM, k_clusters=3, n_iter=1, tau=(11, 10)).collect()
    assert len(out) == 30 and all(r.keep for r in out)
