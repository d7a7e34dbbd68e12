"""Judged query registry: Spark callables + DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 registers here via the ``@query``
decorator; ``__spark_entry__.py`` re-exports the two dicts. The oracle SQL
must produce bit-identical results to the Spark callable (same column names;
same values after the driver's sort-by-column-name + row-sort + hash).

Determinism rules used throughout (see ``helpers``):

- Sums of doubles go through ``CAST(x AS DECIMAL(18,6))`` before SUM: decimal
  addition is exact and associative, so shuffle/partition order cannot change
  the result, and DuckDB and Spark round the same double to the same decimal.
- Averages are ``decimal_sum / count`` — both engines then perform one IEEE
  division on identical inputs.
- Every ORDER BY / window ORDER BY / top-k carries a unique tie-break key.
- Timestamp outputs are cast to DATE (or truncated) to avoid ns/us precision
  skew between engines.
- DuckDB SUM over integers returns HUGEINT → always CAST AS BIGINT in oracle
  SQL to match Spark's LongType.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a judged query; ``oracle`` is the DuckDB-equivalent SQL.

    Queries with no SQL-expressible oracle (custom stateful streaming,
    iterative algorithms) pass ``oracle=None`` and get the driver's weaker
    rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


# The driver judges exactly the FIRST 50 names in ``all_queries()`` order
# (verified round 10: CORRECTNESS_r10 keys == list(all_queries())[:50]).
# Registration order alone would pin the same 50 early names forever, so
# most queries would never receive a hard external correctness row.
# _WINDOW rotates the judged window explicitly: these names are emitted
# first (in this order), then every other registered name in registration
# order.  Round 14 window (VERDICT r13 Next #1): the 31 names that have
# NEVER had a driver row in rounds 1-13 (verified programmatically against
# every CORRECTNESS_r*.json at round start) + the 19 STALEST green rows by
# latest-judged round (r04 x5, r05 x11, r06 x3 -- every earlier vintage was
# already re-confirmed by a later rotation), re-judged under the current
# engine.  After this window, every query registered THROUGH ROUND 13
# has had a hard driver row at least once and none is staler than r07;
# the queries ADDED in round 14 (appended after slot 50, per the
# append-after-window contract) are the only never-judged names left
# and belong at the front of the round-15 window.
_WINDOW: list[str] = [
    # --- never judged: r13 TxTable / operational newcomers ---
    "tx_restore_rollup",
    "tx_merge_tombstone_rollup",
    "tx_clone_rollup",
    "tx_wap_audit_rollup",
    "tx_files_optimize_rollup",
    "tx_timestamp_as_of_rollup",
    "stream_quality_quarantine_rollup",
    "blob_csv_gzip_rollup",
    "sim_ann_ivf_persisted_index_rollup",
    "bloom_runtime_filter_join",
    "pipeline_data_quality_report",
    # --- never judged: streaming sketch rollups ---
    "stream_bottomk_quantiles_rollup",
    "stream_hll_distinct_rollup",
    # --- never judged: ANN recall / similarity stragglers ---
    "sim_ann_pq_sampled_topk",
    "sim_ann_ivfpq_rerank_recall",
    "sim_ann_pq_rerank_recall",
    "sim_scalar_quant_recall",
    "sim_mrl_truncated_recall",
    "dedup_semantic_recall",
    "dedup_images_clusters",
    "dedup_clusters_best_quality",
    "sample_negatives_contrastive",
    # --- never judged: multimodal ---
    "multimodal_gif_anim_stats",
    "multimodal_video_framesample",
    "multimodal_av_container_stats",
    # --- never judged: text ---
    "text_bpe_apply_tokenize",
    "text_source_overlap_matrix",
    "text_bigram_lm_logprob",
    "text_shingle_udtf_stats",
    "text_doc_keywords_topk",
    "text_inverted_posting_stats",
    # --- re-judges: stalest green rows (latest driver row r04) ---
    "argmax_event_per_type",
    "first_last_order_per_customer",
    "having_active_event_types",
    "ntile_percent_rank_orders",
    "percentiles_order_value",
    # --- re-judges: stalest green rows (latest driver row r05) ---
    "asof_join_latest_order",
    "correlated_above_segment_avg",
    "cube_returnflag_linestatus",
    "grouping_sets_brand_type",
    "range_join_events_near_orders",
    "rollup_status_priority",
    "scalar_funcs_orders",
    "theta_join_overpriced_lineitems",
    "union_all_keys",
    "window_order_gap_days",
    "window_order_rank",
    # --- re-judges: stalest green rows (latest driver row r06) ---
    "join_anti_customers_without_orders",
    "join_outer_order_counts",
    "join_semi_customers_with_open_orders",
]



def _windowed(d: dict) -> dict:
    head = {n: d[n] for n in _WINDOW if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return _windowed(_QUERIES)


def all_oracle_sql() -> dict[str, str]:
    _load_all()
    return _windowed(_ORACLE)


_LOADED = False


def _load_all() -> None:
    """Import every query module (registration happens at import time)."""
    global _LOADED
    if _LOADED:
        return
    from reflex_spark.queries import (  # noqa: F401
        behavioral,
        events,
        graph,
        pipeline,
        relational,
        relational_ext,
        relational_tpch,
        relational_tpch2,
        similarity,
        streaming_judged,
        text,
    )

    _LOADED = True
