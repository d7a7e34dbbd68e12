"""operators/runtime_filter: Bloom join reduction — no false negatives,
real pruning, codegen-resident probe."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from reflex_spark.operators.runtime_filter import (
    bloom_build,
    bloom_prefilter,
    bloom_semi_join,
)


def test_no_false_negatives_and_prunes(spark):
    big = spark.range(20000).select(F.col("id").alias("k"))
    small = spark.range(0, 20000, 97).select(F.col("id").alias("k"))  # 207 keys
    bm = bloom_build(small, "k")
    passed = {r["k"] for r in bloom_prefilter(big, "k", bm).collect()}
    members = {r["k"] for r in small.collect()}
    assert members <= passed, "Bloom dropped a true member"
    # fp rate at 207 keys / 65536 bits ≈ (1-e^-0.0126)^4 ≈ 2.5e-8
    assert len(passed) < 0.05 * 20000


def test_semi_join_is_exact(spark):
    big = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("v")
    )
    small = spark.range(0, 5000, 31).select(
        F.col("id").alias("sk"), F.lit("x").alias("tag")
    )
    got = sorted(
        tuple(r)
        for r in bloom_semi_join(big, small, "k", "sk").select("k", "v", "tag").collect()
    )
    want = sorted(
        tuple(r)
        for r in big.join(small, big["k"] == small["sk"]).select("k", "v", "tag").collect()
    )
    assert got == want and got


def test_null_keys_excluded_from_build_and_never_pass(spark):
    small = spark.createDataFrame([(None,), (7,)], "k long")
    bm = bloom_build(small, "k")
    big = spark.createDataFrame([(None,), (7,), (8,)], "k long")
    passed = [r["k"] for r in bloom_prefilter(big, "k", bm).collect()]
    assert 7 in passed and None not in passed


def test_probe_is_codegen_scan_side(spark):
    """The prefilter must be a Filter inside WholeStageCodegen on the
    probe side — no exchange, no Python stage added."""
    bm = bloom_build(spark.range(10).select(F.col("id").alias("k")), "k")
    plan = (
        bloom_prefilter(spark.range(1000).select(F.col("id").alias("k")), "k", bm)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    # '*(1)' = whole-stage-codegen stage 1 in the simple plan string
    assert plan.lstrip().startswith("*(1)")
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan


def test_m_bits_must_be_word_aligned(spark):
    with pytest.raises(ValueError):
        bloom_build(spark.range(1).select(F.col("id").alias("k")), "k", m_bits=100)


def test_outer_and_anti_joins_refused(spark):
    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner/semi"):
        bloom_semi_join(big, small, "k", how="left")
    with pytest.raises(ValueError, match="inner/semi"):
        bloom_semi_join(big, small, "k", how="left_anti")


def test_cross_type_keys_fall_back_to_plain_join(spark):
    """build hashes the small side's string rendering and the probe the
    big side's — bigint 7 and string '007' equi-join-match but hash to
    different bits, so a cross-type pair must SKIP the prefilter (plain
    join, still exact) rather than silently drop rows."""
    big = spark.createDataFrame([(7, "a"), (8, "b")], "k long, v string")
    small = spark.createDataFrame([("007",), ("9",)], "sk string")
    got = sorted(
        tuple(r)
        for r in bloom_semi_join(big, small, "k", "sk")
        .select("k", "v")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in big.join(small, big["k"] == small["sk"])
        .select("k", "v")
        .collect()
    )
    assert got == want and got == [(7, "a")]
