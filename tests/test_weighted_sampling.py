"""Weighted sampling without replacement (Efraimidis-Spirakis):
Spark-vs-numpy formula parity and the statistical contract that
selection frequency tracks weight across seeds."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from reflex_spark.operators.sampling import weighted_sample_wor


def es_key(seed: str, ident: int, tier: int) -> float:
    """Pure-Python replica of the operator's key: md5 -> 52-bit uniform
    -> iterated sqrt. math.sqrt is correctly rounded, same bits as
    Spark/DuckDB."""
    h = int(hashlib.md5(f"{seed}|{ident}".encode()).hexdigest()[:13], 16)
    u = (h + 1.0) / float(1 << 52)
    for _ in range(tier):
        u = math.sqrt(u)
    return u


def test_spark_matches_numpy_replica(spark):
    rows = [(i, i % 4) for i in range(500)]  # tiers 0..3 round-robin
    df = spark.createDataFrame(rows, "id long, tier int")
    got = weighted_sample_wor(df, "id", F.col("tier"), k=25, seed="s7").collect()
    expect = sorted(
        ((es_key("s7", i, t), -i, i, t) for i, t in rows), reverse=True
    )[:25]
    assert [(r["id"], r["__w"]) for r in got] == [
        (i, 1 << t) for _, _, i, t in expect
    ]
    # keys are bit-identical, not just same order
    for r, (k, _, _, _) in zip(got, expect):
        assert r["__es_key"] == k


def test_first_draw_probability_proportional_to_weight():
    """P(first draw lands in tier t) = w_t * n_t / sum over all — exact
    for the max-key draw. 400 seeds x 400 items, tolerance 4 sigma."""
    n = 400
    tiers = np.array([i % 4 for i in range(n)])
    weights = 1 << tiers
    total = weights.sum()
    hits = np.zeros(4)
    n_seeds = 400
    for s in range(n_seeds):
        keys = [es_key(f"seed{s}", i, int(tiers[i])) for i in range(n)]
        hits[tiers[int(np.argmax(keys))]] += 1
    for t in range(4):
        p = (1 << t) * (n // 4) / total
        sd = math.sqrt(n_seeds * p * (1 - p))
        assert abs(hits[t] - n_seeds * p) <= 4 * sd, (
            f"tier {t}: {hits[t]} first-draws vs expected {n_seeds * p:.1f} "
            f"(sd {sd:.1f})"
        )


def test_without_replacement_and_k_exact(spark):
    df = spark.createDataFrame([(i, 3) for i in range(40)], "id long, tier int")
    got = weighted_sample_wor(df, "id", F.col("tier"), k=10, seed="x").collect()
    ids = [r["id"] for r in got]
    assert len(ids) == 10 and len(set(ids)) == 10  # exactly k, no repeats
    assert all(r["__w"] == 8 for r in got)
    # keys strictly descending (distinct uniforms -> no ties)
    keys = [r["__es_key"] for r in got]
    assert keys == sorted(keys, reverse=True) and len(set(keys)) == 10


def test_tier_caps_at_max_tier(spark):
    df = spark.createDataFrame([(1, 9)], "id long, tier int")
    r = weighted_sample_wor(df, "id", F.col("tier"), k=1, seed="x").collect()[0]
    assert r["__w"] == 8 and r["__es_key"] == es_key("x", 1, 3)


def test_group_split_atomic_deterministic_and_salted(spark):
    from reflex_spark.operators.sampling import group_split

    df = spark.range(0, 3000).selectExpr("id % 300 AS g", "id AS row_id")
    out = group_split(df, "g", {"train": 0.8, "val": 0.1, "test": 0.1})
    # group-atomic: every group maps to exactly one split
    assert (
        out.groupBy("g").agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1).count() == 0
    )
    # deterministic across invocations
    a = {r["g"]: r["split"] for r in out.select("g", "split").distinct().collect()}
    b = {
        r["g"]: r["split"]
        for r in group_split(df, "g", {"train": 0.8, "val": 0.1, "test": 0.1})
        .select("g", "split").distinct().collect()
    }
    assert a == b
    # all splits realized, remainder falls into the LAST split
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}
    # a different salt re-rolls membership without touching data
    c = {
        r["g"]: r["split"]
        for r in group_split(df, "g", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="v2")
        .select("g", "split").distinct().collect()
    }
    assert c != a
