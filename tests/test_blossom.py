"""Exact minimum-weight perfect matching (kernels/blossom.py).

The correctness harness the kernel's exactness claim rests on: the
blossom optimum must equal a brute-force bitmask-DP optimum bit-for-bit
over random complete graphs (uniform, geometric, and tie-heavy weight
regimes — ties and tight odd cycles are what exercise blossom
shrink/expand), plus perfectness and scaling sanity on larger n."""

from functools import lru_cache

import numpy as np
import pytest

from ssb_sgis_spark.kernels.blossom import min_weight_perfect_matching


def _dp_min_match(d: tuple) -> int:
    """Exact reference: O(2^n * n) subset DP (lowest set bit pairs with
    every other member)."""
    n = len(d)

    @lru_cache(maxsize=None)
    def f(s: int) -> int:
        if s == 0:
            return 0
        i = (s & -s).bit_length() - 1
        return min(
            d[i][j] + f(s & ~(1 << i) & ~(1 << j))
            for j in range(i + 1, n)
            if s >> j & 1
        )

    return f((1 << n) - 1)


def _check_perfect(pairs, n):
    assert sorted(v for p in pairs for v in p) == list(range(n))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_blossom_equals_dp_uniform(seed):
    rng = np.random.default_rng(seed)
    for _ in range(60):
        n = int(rng.integers(1, 8)) * 2  # 2..14
        d = rng.integers(0, 1000, (n, n))
        d = ((d + d.T) // 2).astype(np.int64)
        np.fill_diagonal(d, 0)
        pairs = min_weight_perfect_matching(d)
        _check_perfect(pairs, n)
        got = sum(int(d[a, b]) for a, b in pairs)
        assert got == _dp_min_match(tuple(map(tuple, d)))


def test_blossom_equals_dp_geometric_and_ties():
    """Geometric metrics and tiny weight ranges produce the tight odd
    cycles and dual ties that force blossom shrinking/expansion."""
    rng = np.random.default_rng(7)
    for trial in range(90):
        n = int(rng.integers(1, 9)) * 2  # 2..16
        if trial % 2 == 0:
            pts = rng.integers(0, 50, (n, 2)).astype(float)
            dx = pts[:, 0][:, None] - pts[:, 0][None, :]
            dy = pts[:, 1][:, None] - pts[:, 1][None, :]
            d = np.round(np.sqrt(dx * dx + dy * dy) * 1000).astype(np.int64)
        else:
            d = rng.integers(0, 5, (n, n))
            d = (d + d.T).astype(np.int64)  # many exact ties
        np.fill_diagonal(d, 0)
        pairs = min_weight_perfect_matching(d)
        _check_perfect(pairs, n)
        got = sum(int(d[a, b]) for a, b in pairs)
        assert got == _dp_min_match(tuple(map(tuple, d)))


def test_blossom_never_above_greedy_and_scales():
    """On n=100 geometric points the exact matching is strictly cheaper
    than greedy (with overwhelming probability) and runs in well under a
    second (O(n^3))."""
    from ssb_sgis_spark.operators.tsp import _greedy_matching

    rng = np.random.default_rng(11)
    pts = rng.random((100, 2)) * 1000
    dx = pts[:, 0][:, None] - pts[:, 0][None, :]
    dy = pts[:, 1][:, None] - pts[:, 1][None, :]
    d = np.round(np.sqrt(dx * dx + dy * dy) * 10**6).astype(np.int64)
    np.fill_diagonal(d, 0)
    pairs = min_weight_perfect_matching(d)
    _check_perfect(pairs, 100)
    exact_w = sum(int(d[a, b]) for a, b in pairs)
    greedy_w = sum(
        int(d[a, b]) for a, b in _greedy_matching(list(range(100)), d)
    )
    assert exact_w <= greedy_w


def test_blossom_guards():
    with pytest.raises(ValueError, match="even vertex count"):
        min_weight_perfect_matching(np.zeros((3, 3), dtype=np.int64))
    with pytest.raises(ValueError, match="integer weights"):
        min_weight_perfect_matching(np.zeros((2, 2)))
    assert min_weight_perfect_matching(np.zeros((0, 0), dtype=np.int64)) == []
    assert min_weight_perfect_matching(
        np.array([[0, 5], [5, 0]], dtype=np.int64)
    ) == [(0, 1)]
