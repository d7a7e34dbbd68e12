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
# order.  Round 15 window (VERDICT r14 Next #1): the 4 round-14 additions
# (the only registered names without a driver row; the r14 judge verified
# all 4 bit-green at sf0.001+sf0.01 at the driver surface) + the 46
# stalest green rows by latest-judged round, computed programmatically
# against every CORRECTNESS_r*.json at round start: r06 x2, r07 x6,
# r08 x5, and the 33 oldest r10 rows (file order within the vintage).
# After this window, every registered query has a hard driver row and
# none is staler than r10.  Queries ADDED in round 15 are appended after
# slot 50, per the append-after-window contract.
_WINDOW: list[str] = [
    # --- never judged: the 4 round-14 additions ---
    "tx_concurrent_retry_rollup",
    "sim_ann_ivf_append_rollup",
    "sim_ann_ivf_split_rollup",
    "blob_poll_midblob_rollup",
    # --- re-judges: stalest green rows (latest driver row r06) ---
    "q5_region_revenue",
    "topk_orders",
    # --- re-judges: stalest green rows (latest driver row r07) ---
    "skew_salted_rollup",
    "sample_temperature_mixture",
    "skew_salted_join_revenue",
    "sample_train_val_test_split",
    "q1_pricing_summary",
    "q3_shipping_priority",
    # --- re-judges: stalest green rows (latest driver row r08) ---
    "map_functions_events",
    "events_user_summary_pandas",
    "conditional_expressions_customers",
    "sample_token_budget",
    "text_sequence_packing",
    # --- re-judges: the 33 oldest r10-vintage rows ---
    "funnel_signup_to_purchase",
    "retention_weekly",
    "event_type_cooccurrence",
    "events_first_touch_attribution",
    "events_funnel_3step_ordered",
    "events_cohort_retention_matrix",
    "events_transition_matrix",
    "events_per_type_day",
    "events_type_filter",
    "events_lag_filter",
    "events_tumbling_hourly",
    "events_sliding_window",
    "events_session_count",
    "events_distinct_users",
    "setop_intersect_purchasers_clickers",
    "setop_except_signups_no_purchase",
    "setop_except_all_purchases",
    "setop_intersect_all_purchases",
    "events_json_props",
    "events_running_value",
    "events_sessionized",
    "events_value_histogram",
    "events_trailing_hour_sum",
    "union_distinct_user_ids",
    "events_pivot_type_counts",
    "events_max_concurrent",
    "events_session_window_native",
    "events_gapfill_interpolate",
    "events_variant_props",
    "events_hll_distinct_users",
    "events_hll_merged_daily",
    "events_value_histogram_quantiles",
    "events_hll_daily_series",
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
