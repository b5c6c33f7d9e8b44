"""Johnson-Lindenstrauss projection (operators/jl.py)."""

import numpy as np

from ssb_sgis_spark.operators.jl import jl_project, jl_signs


def test_jl_matches_numpy_rederivation(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 64).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = {}
    for r in jl_project(df, out_dim=16).collect():
        out.setdefault(r.vec_id, {})[r.k] = r.y
    S = np.array(jl_signs(16, 64), dtype=np.int64)
    for i, v in enumerate(vecs):
        v64 = v.astype(np.float64)
        nrm = float(np.sqrt(np.dot(v64, v64)))
        # numpy rint = round-half-even = Spark round on .5? Spark round()
        # is half-up; avoid ties by construction (randn never hits .5)
        q = np.floor(127.0 * v64 / nrm + 0.5).astype(np.int64)
        q2 = np.rint(127.0 * v64 / nrm).astype(np.int64)
        want = S @ q2
        got = np.array([out[i][k] for k in range(16)])
        # accept either rounding on exact-tie codes (none expected)
        assert (got == want).all() or (got == S @ q).all()


def test_jl_distance_preservation(spark):
    """The JL property: projected squared distances / d' approximate
    original squared code distances / d within a loose constant factor
    for well-separated random vectors."""
    rng = np.random.RandomState(11)
    vecs = rng.randn(12, 64).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    proj = {}
    for r in jl_project(df, out_dim=16).collect():
        proj.setdefault(r.vec_id, [0] * 16)[r.k] = r.y
    codes = {}
    for i, v in enumerate(vecs):
        v64 = v.astype(np.float64)
        codes[i] = np.rint(127.0 * v64 / np.sqrt(np.dot(v64, v64)))
    ratios = []
    for a in range(6):
        for b in range(6, 12):
            d_orig = float(np.sum((codes[a] - codes[b]) ** 2)) / 64
            y = np.array(proj[a]) - np.array(proj[b])
            d_proj = float(np.sum(y.astype(np.float64) ** 2)) / (16 * 64)
            ratios.append(d_proj / d_orig)
    # E[ratio] = 1 under the JL sign model; allow wide per-pair spread
    # but the mean must land near 1
    assert 0.5 < float(np.mean(ratios)) < 2.0
    assert all(0.1 < r < 10 for r in ratios)
