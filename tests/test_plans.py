"""Physical-plan assertions: the properties that make queries scale.

These guard against regressions in the *shape* of execution, not results:
filter pushdown to the parquet scan, broadcast joins for dims, top-k as
TakeOrderedAndProject (per-partition heaps, no global sort), and no
row-at-a-time Python UDFs in judged JVM-path queries.
"""

from __future__ import annotations

import pytest

from reflex_spark.queries import all_queries
from tests.conftest import SF_MEDIUM

QUERIES = all_queries()


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_MEDIUM)
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_filter_pushed_to_scan(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_shipdate" in plan
    # partial+final aggregation (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2


def test_q5_dims_broadcast(spark):
    plan = plan_of(spark, "q5_region_revenue")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(r_name,ASIA)" in plan  # dim filter pushed into dim scan
    assert "SortMergeJoin" not in plan or "BroadcastHashJoin" in plan


def test_topk_uses_take_ordered(spark):
    for name in ("topk_orders", "q3_shipping_priority"):
        assert "TakeOrderedAndProject" in plan_of(spark, name), name


def test_type_filter_pushdown(spark):
    plan = plan_of(spark, "events_type_filter")
    assert "PushedFilters" in plan
    assert "In(event_type" in plan


def test_column_pruning_on_projection(spark):
    plan = plan_of(spark, "events_type_filter")
    # only the selected+filter columns are read, not props/value/ts
    assert "props" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_no_python_udf_in_jvm_path_queries(spark):
    """Judged JVM-path queries must stay in codegen (no BatchEvalPython).
    (sim_pairs_cosine intentionally uses mapInPandas/Arrow — excluded.)"""
    for name in (
        "q1_pricing_summary",
        "events_per_type_day",
        "dedup_minhash_lsh",
        "text_quality_scores",
        "sim_topk_cosine",
    ):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, name


def test_agg_partial_before_shuffle(spark):
    """events_per_type_day: exchange sits between partial and final agg."""
    plan = plan_of(spark, "events_per_type_day")
    first_agg = plan.index("HashAggregate")
    exchange = plan.index("Exchange")
    assert first_agg < exchange
