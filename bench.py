#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the `noop` sink (full distributed
execution, no driver-side collect). Every query runs twice: the first run
is untimed warmup (whole-stage codegen compilation + JIT dominate cold
runs: q1 measures 7.5s cold vs 2.3s warm), the second is the reported
steady-state number.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reflex_spark.queries import all_queries
from reflex_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "events_per_type_day",
    "events_session_count",
    "events_running_value",
    "window_order_rank",
    "join_outer_order_counts",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
    "sim_pairs_cosine",
    "text_quality_scores",
    "asof_join_latest_order",
    "q6_revenue_change",
    "q10_returned_revenue",
    "q14_promo_revenue_pct",
    "q18_large_orders",
    "tfidf_top_terms",
    "sample_documents_hash",
    "funnel_signup_to_purchase",
    "retention_weekly",
    "events_trailing_hour_sum",
    "range_join_events_near_orders",
    "q7_nation_volume",
    "q8_market_share",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    "dedup_embedding_cosine",
    # round 2 additions: approximate paths + streaming machinery, so
    # regressions there are visible round-over-round (VERDICT r1 #8)
    "dedup_simhash",
    "sim_ann_ivf_topk",
    "sim_ann_lsh_topk",
    "stream_rollup_counts",
    # round 4 additions: recall invariants + the two new end-to-end
    # streaming shapes, so regressions there are visible round-over-round
    "sim_ann_recall",
    "stream_watermark_rollup",
    "stream_sharded_rollup",
    "tx_merge_orders",
    "dedup_clusters",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark(app_name="reflex_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Warm up the JVM + parquet footers so query 1 isn't charged for startup.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def execute(name: str) -> None:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        execute(name)  # warmup: codegen/JIT compile
        t0 = time.perf_counter()
        execute(name)
        timings[name] = round(time.perf_counter() - t0, 3)
        # Queries are independent: drop their cached intermediates so one
        # query's cache cannot distort the next (see SCALE_NOTES.md §7 —
        # accumulated caches inflated the 34-query total by ~40s at sf0.1).
        # The warmup→timed cache reuse within a query is unaffected.
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
