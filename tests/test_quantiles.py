"""KLL sketch properties (operators/quantiles.py): error bound across
distributions, merge-vs-direct parity, determinism, serialization."""

from __future__ import annotations

import numpy as np
import pytest

from reflex_spark.operators.quantiles import KLLSketch, kll_from_sketch_rows

TARGETS = [(1, 2), (9, 10), (99, 100)]


def exact_rank(data: np.ndarray, v: float) -> int:
    return int((data <= v).sum())


def check_bound(sk: KLLSketch, data: np.ndarray) -> None:
    for num, den in TARGETS:
        est = sk.quantile(num, den)
        sk.check_rank_error(est, exact_rank(data, est), num, den)


@pytest.mark.parametrize(
    "dist",
    [
        lambda rng, n: rng.uniform(0, 1000, n),
        lambda rng, n: rng.lognormal(3, 2, n),
        lambda rng, n: rng.integers(0, 50, n).astype(float),  # heavy ties
        lambda rng, n: np.sort(rng.uniform(0, 1, n)),  # adversarial: sorted
    ],
    ids=["uniform", "lognormal", "discrete", "sorted"],
)
@pytest.mark.parametrize("n", [1_000, 50_000])
def test_kll_rank_error_within_envelope(dist, n):
    rng = np.random.default_rng(42)
    data = dist(rng, n)
    sk = KLLSketch(k=200, seed=17)
    for chunk in np.array_split(data, max(1, n // 4096)):
        sk.update_many(chunk)
    assert sk.n == n
    check_bound(sk, data)


def test_kll_merge_matches_envelope_and_counts():
    rng = np.random.default_rng(7)
    data = rng.lognormal(2, 1.5, 40_000)
    shards = np.array_split(data, 16)
    merged = KLLSketch(k=200, seed=17)
    for s in shards:
        part = KLLSketch(k=200, seed=17)
        part.update_many(s)
        merged.merge(part)
    assert merged.n == len(data)
    check_bound(merged, data)


def test_kll_deterministic_given_layout():
    rng = np.random.default_rng(3)
    data = rng.uniform(0, 100, 20_000)

    def build():
        sk = KLLSketch(k=128, seed=5)
        for chunk in np.array_split(data, 10):
            sk.update_many(chunk)
        return sk

    a, b = build(), build()
    assert a.levels == b.levels  # bit-identical retained sets
    for num, den in TARGETS:
        assert a.quantile(num, den) == b.quantile(num, den)


def test_kll_row_roundtrip_preserves_estimates():
    rng = np.random.default_rng(11)
    parts = [rng.uniform(0, 10, 5_000) for _ in range(4)]
    rows = []
    direct = KLLSketch(k=200, seed=17)
    for pid, p in enumerate(parts):
        sk = KLLSketch(k=200, seed=17)
        sk.update_many(p)
        rows += [{"pid": t[0], "level": t[1], "item": t[2]} for t in sk.to_rows(pid)]
        direct.merge(sk)
    rebuilt = kll_from_sketch_rows(rows, k=200, seed=17)
    assert rebuilt.n == direct.n == 20_000
    data = np.concatenate(parts)
    check_bound(rebuilt, data)


def test_kll_memory_stays_bounded():
    rng = np.random.default_rng(1)
    sk = KLLSketch(k=200, seed=17)
    for _ in range(50):
        sk.update_many(rng.uniform(0, 1, 4096))
    # retained items O(k log(n/k)): generous 6k ceiling for n=200k, k=200
    assert sk.size() <= 6 * 200
    assert sk.n == 50 * 4096


def test_kll_nan_and_empty():
    sk = KLLSketch(k=64, seed=1)
    sk.update_many([float("nan")] * 5)
    assert sk.n == 0
    with pytest.raises(ValueError):
        sk.quantile(1, 2)
    sk.update_many([3.0])
    assert sk.quantile(1, 2) == 3.0
