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
        "events_max_concurrent",
        "pipeline_corpus_end2end",
    ):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, name


def test_decontaminate_broadcasts_eval_set(spark):
    """The eval n-gram set must be broadcast: at 100 TB the corpus side
    cannot shuffle for the membership join. Also all three hygiene
    queries must stay in codegen (no Python UDF)."""
    plan = plan_of(spark, "text_decontaminate")
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    # exactly one exchange on the corpus path: the per-doc count agg.
    # (the broadcast build side has its own small exchange+distinct)
    assert plan.count("Exchange hashpartitioning") <= 2
    for name in ("text_decontaminate", "text_pii_redact", "text_repetition_removal"):
        assert "BatchEvalPython" not in plan_of(spark, name), name


def test_connected_components_star_plan_stays_jvm(spark):
    """One large-star/small-star round must be pure JVM shuffles: no
    Python UDF (BatchEvalPython / mapInPandas), no BroadcastNestedLoop,
    no driver-side edge materialization. The iterative closure's scale
    claim (SCALE_NOTES §8) rests on each round being groupBy+join only."""
    from pyspark.sql import functions as F

    from reflex_spark.operators.dedup import _star_round

    edges = spark.range(500).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    round_df = _star_round(edges)
    jvm = spark._jvm
    plan = round_df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan  # the per-node min is a real partial agg


def test_agg_partial_before_shuffle(spark):
    """events_per_type_day: exchange sits between partial and final agg."""
    plan = plan_of(spark, "events_per_type_day")
    first_agg = plan.index("HashAggregate")
    exchange = plan.index("Exchange")
    assert first_agg < exchange


def test_q7_q8_dims_broadcast(spark):
    """q7/q8 star joins: every dimension side must broadcast (the only
    SortMergeJoins allowed are fact-to-fact on orderkey/custkey)."""
    for name in ("q7_nation_volume", "q8_market_share"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name


def test_q8_dim_filters_pushed(spark):
    plan = plan_of(spark, "q8_market_share")
    assert "EqualTo(r_name,EUROPE)" in plan  # region filter at the scan
    assert "EqualTo(p_type,PROMO)" in plan  # part filter at the scan


def test_q19_brand_filter_pushed(spark):
    plan = plan_of(spark, "q19_disjunctive_revenue")
    assert "In(p_brand" in plan  # brand-band union pushed into part scan


def test_q15_shipdate_pushed(spark):
    plan = plan_of(spark, "q15_top_supplier")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan


def test_q22_anti_join_shape(spark):
    plan = plan_of(spark, "q22_idle_rich_customers")
    assert "LeftAnti" in plan
    # anti join's build side reads only o_custkey (column pruning)
    orders_schema = [
        seg.split("\n")[0]
        for seg in plan.split("ReadSchema: ")[1:]
        if "o_custkey" in seg.split("\n")[0]
    ]
    assert orders_schema and all(
        "o_totalprice" not in s for s in orders_schema
    )


def test_round6_queries_stay_jvm_and_broadcast(spark):
    """Round-6 plan pins: the new JVM-path queries must not fall into
    Python eval, the PQ LUT/attribution build sides broadcast, triangle
    counting must not degrade to a nested-loop join, and boilerplate
    span dedup keeps its two-shuffle shape."""
    for name in (
        "graph_triangle_count",
        "text_boilerplate_spans",
        "events_session_window_native",
        "events_gapfill_interpolate",
        "events_variant_props",
        "events_first_touch_attribution",
        "sample_temperature_mixture",
    ):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan or name in (
            "sample_temperature_mixture",  # 1-row totals crossJoin is fine
            "graph_triangle_count",  # 1-row scalar-agg crossJoins only
        ), name

    # triangle counting: the wedge and closing joins themselves must be
    # hash/merge equi-joins (the only BNLJs are the two 1-row scalar
    # crossJoins combining n_nodes/n_edges/n_triangles)
    tri = plan_of(spark, "graph_triangle_count")
    # formatted explain names each node twice (tree + details): 2 nodes
    assert tri.count("BroadcastNestedLoopJoin") <= 4
    assert (
        "SortMergeJoin" in tri
        or "ShuffledHashJoin" in tri
        or "BroadcastHashJoin" in tri
    )

    # session_window must use the dedicated merging-sessions aggregate,
    # not a generic window function
    sw = plan_of(spark, "events_session_window_native")
    assert "session_window" in sw or "MergingSessions" in sw

    # attribution: an equi-join resolution (hash/merge family — at toy SF
    # the click side broadcasts; at scale size stats flip it to a
    # user_id co-shuffle), never a nested loop
    attr = plan_of(spark, "events_first_touch_attribution")
    assert any(
        j in attr
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert "BroadcastNestedLoopJoin" not in attr

    # temperature mixture: the rate table joins broadcast
    mix = plan_of(spark, "sample_temperature_mixture")
    assert "BroadcastHashJoin" in mix


def test_round7_queries_plan_shapes(spark):
    """Round-7 plan pins: the CMS sketch join broadcasts the counter
    table (depth×width rows — never a shuffle side), the audio/GIF
    pipelines keep Python confined to Arrow stages, and the IVF-PQ scan
    has no nested-loop joins (every join is equi on __m/ivf_list/cid)."""
    cms = plan_of(spark, "events_cms_heavy_hitters")
    assert "BatchEvalPython" not in cms
    assert "BroadcastHashJoin" in cms
    assert "TakeOrderedAndProject" in cms  # top-10 as per-partition heaps

    for name in ("multimodal_audio_stats", "multimodal_gif_anim_stats"):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "MapInPandas" in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name

    # Bloom pruning: the filter side broadcasts (the whole point — a
    # <=32 KB bit relation), and the top-level combine of 1-row counts
    # is the only nested-loop shape
    bloom = plan_of(spark, "bloom_filter_customer_prune")
    assert "BatchEvalPython" not in bloom
    assert "BroadcastHashJoin" in bloom

    # term drift: token totals broadcast; both top-k stages are
    # per-partition heaps, never a global sort
    drift = plan_of(spark, "text_term_drift_chi2")
    assert "BatchEvalPython" not in drift
    assert "TakeOrderedAndProject" in drift

    # IVF-PQ: the only BNLJs are the deliberate keyless joins against the
    # n_lists-row broadcast centroid table (assignment + query probe —
    # each input row meets 8 broadcast rows then window-argmins; the same
    # bounded shape as the judged IVF/k-means queries). The PQ/LUT joins
    # are all equi (hash family), and the top-k is a TakeOrdered.
    ivfpq = plan_of(spark, "sim_ann_ivfpq_topk")
    assert "BatchEvalPython" not in ivfpq
    assert "BroadcastHashJoin" in ivfpq
    assert "TakeOrderedAndProject" in ivfpq
    # formatted explain names each node twice (tree + details)
    assert ivfpq.count("BroadcastNestedLoopJoin") <= 6


def test_image_phash_python_confined_to_arrow_stages(spark):
    """dedup_images_phash: the ONLY Python in the plan is the Arrow codec
    stage (MapInPandas encode/hash) — bucket counting, the dense-grid
    fill, and the Hamming blocking join all stay JVM-side; no
    row-at-a-time BatchEvalPython, no nested-loop pair join."""
    plan = plan_of(spark, "dedup_images_phash")
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the blocking candidate join is an equi-join
    assert any(
        j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_semantic_dedup_list_scoped_gemm(spark):
    """dedup_semantic_clusters must be the SemDeDup composition running
    the LIST-SCOPED vectorized verify — not the quadratic full-corpus
    GEMM and not the slow per-pair expression fold: the only Python node
    is the tiled-GEMM applyInPandas whose grouping INCLUDES the list id
    (candidate pairs exist only within a list), there is no
    row-at-a-time BatchEvalPython, and the only nested-loop shapes are
    the bounded keyless joins against the 16-row broadcast centroid
    table (2 fit iterations + the final assignment; formatted explain
    names each node twice)."""
    plan = plan_of(spark, "dedup_semantic_clusters")
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" in plan  # the per-list GEMM kernel
    assert "__grp" in plan  # ...grouped by the list id, not global
    assert plan.count("BroadcastNestedLoopJoin") <= 6


def test_video_stats_python_confined_to_arrow_stages(spark):
    """multimodal_video_stats: frame synthesis is a JVM array expression;
    the ONLY Python is the two Arrow codec stages (JPEG/AVI encode,
    container walk + decode + integer features) — no row-at-a-time
    BatchEvalPython, no joins at all on the Spark side."""
    plan = plan_of(spark, "multimodal_video_stats")
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") >= 2


def test_round8_queries_plan_shapes(spark):
    """Round-8 plan pins: OHLC's first/last selection is the partial+
    final SortAggregate pair (never a window over every event), the
    cohort/transition matrices broadcast their control-plane size
    tables, edit-distance blocking is an equi-join with the Levenshtein
    DP JVM-side (no Python anywhere), and the bigram LM stays in
    codegen."""
    ohlc = plan_of(spark, "events_ohlc_hourly")
    assert "SortAggregate" in ohlc  # min/max over struct: partial+final
    assert "Window" not in ohlc
    assert "BatchEvalPython" not in ohlc

    for name in ("events_transition_matrix", "events_cohort_retention_matrix"):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "BroadcastHashJoin" in plan, name

    ed = plan_of(spark, "dedup_edit_distance_blocked")
    assert "BatchEvalPython" not in ed
    assert "levenshtein" in ed  # JVM expression, not a UDF
    assert "BroadcastNestedLoopJoin" not in ed

    bi = plan_of(spark, "text_bigram_lm_logprob")
    assert "BatchEvalPython" not in bi


def test_round9_queries_plan_shapes(spark):
    """Round-9 plan pins: the bottom-k sample sketch and the weighted
    reservoir stay pure-JVM with top-k as TakeOrdered (per-partition
    heaps — the distributed-reservoir shape), and the per-doc keyword
    extraction stays in codegen."""
    bk = plan_of(spark, "events_sample_bottomk_quantiles")
    assert "BatchEvalPython" not in bk
    assert "TakeOrderedAndProject" in bk  # global bottom-k merge

    wr = plan_of(spark, "sample_weighted_reservoir")
    assert "BatchEvalPython" not in wr
    assert "TakeOrderedAndProject" in wr  # E-S top-k, never a full sort

    kw = plan_of(spark, "text_doc_keywords_topk")
    assert "BatchEvalPython" not in kw

    # the composed mixture+packing pipeline stays fully JVM-side end to
    # end — three chained stages, no Python anywhere
    mp = plan_of(spark, "pipeline_mixture_pack_end2end")
    assert "BatchEvalPython" not in mp
    assert "CartesianProduct" not in mp

    # EWMA: one shuffle (groupBy user), fold as a JVM higher-order
    # function — no Python, no window
    ew = plan_of(spark, "events_ewma_user_value")
    assert "BatchEvalPython" not in ew
    assert "Window" not in ew

    mips = plan_of(spark, "sim_mips_asymmetric_topk")
    assert "BatchEvalPython" not in mips
    # the 5-query probe side and the 1-row M^2 are broadcast
    assert "BroadcastNestedLoopJoin" in mips or "BroadcastHashJoin" in mips


def test_kll_sketch_stage_no_shuffle(spark):
    """The KLL per-partition sketch build is ONE MapInPandas pass with
    no Exchange before it — partition-local, nothing data-sized moves
    (the collect after it is n_partitions x O(k log) sketch rows)."""
    from reflex_spark.operators.quantiles import kll_partition_sketches
    from reflex_spark.tables import load_tables

    ev = load_tables(spark, SF_MEDIUM)["events"]
    df = kll_partition_sketches(ev.select("value"), "value")
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    assert "ReadSchema: struct<value:double>" in plan  # column-pruned scan


def test_cogroup_runs_flatmap_cogroups_in_pandas(spark):
    """The cogrouped attribution query must execute through the real
    FlatMapCoGroupsInPandas operator (two-sided per-key Arrow transfer)
    — a refactor that silently degrades it to a join would stop
    exercising the surface the query exists to judge."""
    plan = plan_of(spark, "cogroup_click_purchase_attribution")
    assert "FlatMapCoGroupsInPandas" in plan


def test_bucketed_prefix_sum_main_window_is_partitioned(spark):
    """The two-phase scan's PHASE-1 window must run hash-partitioned by
    bucket — exactly ONE SinglePartition exchange is allowed in the
    operator's own plan (the control-plane offsets window over
    num_buckets rows). A second one would mean the main series is being
    funneled through one task, the failure the operator exists to
    avoid."""
    from pyspark.sql import functions as F

    from reflex_spark.operators.scan import bucketed_prefix_sum
    from reflex_spark.tables import load_tables

    ev = load_tables(spark, SF_MEDIUM)["events"]
    out = bucketed_prefix_sum(
        ev,
        order_by=["ts", "event_id"],
        bucket_key="event_id",
        value=F.lit(1),
        out_col="run",
        num_buckets=8,
    )
    jvm = spark._jvm
    plan = out._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert plan.count("SinglePartition") == 1, plan


def test_tx_table_read_pushes_filters_and_prunes_columns(spark, tmp_path):
    """TxTable.read() is a thin parquet plan: a downstream filter must
    reach the scan as a PushedFilter and a 2-column projection must
    shrink ReadSchema — the reason the table reads via spark.read.parquet
    on the snapshot file list instead of any Python-side indirection."""
    from reflex_spark.sources.tx_table import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.range(1000).selectExpr(
            "id AS k", "cast(id % 7 AS string) AS tag", "id * 1.5 AS v"
        )
    )
    df = t.read().where("k > 500").select("k", "tag")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,500)]" in plan
    assert "ReadSchema: struct<k:bigint,tag:string>" in plan
