"""End-to-end governed-table walkthrough of the round-13 surface.

A miniature "data platform day": land raw batches through a
write-audit-publish gate, branch the table for an experiment with a
zero-copy clone, run a declarative quality report, and use a runtime
Bloom filter to keep a selective join from shuffling the fact table.

Run:  python examples/governed_table_pipeline.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflex_spark.operators import validate as V
from reflex_spark.operators.runtime_filter import bloom_semi_join
from reflex_spark.session import get_spark
from reflex_spark.sources.tx_table import AuditFailedError, TxTable
from reflex_spark.tables import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="governed_table_pipeline")
    t = load_tables(spark, sf_dir)
    orders = t["orders"].select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )

    with tempfile.TemporaryDirectory(prefix="governed_") as base:
        table = TxTable(spark, f"{base}/orders", stats_cols=["k"])
        gates = [V.is_unique("k"), V.is_complete("price"), V.has_min("price", lo=0.0)]

        # 1. write-audit-publish: good batch lands, duplicate batch bounces
        table.append_audited(orders.where(F.col("k") % 2 == 0), gates)
        try:
            table.append_audited(orders.where(F.col("k") % 4 == 0), gates)
        except AuditFailedError as exc:
            print(f"audit rejected the overlapping batch: {exc}")
        table.append_audited(orders.where(F.col("k") % 2 == 1), gates)
        print("published versions:", [h["op"] for h in table.history()])

        # 2. zero-copy experiment branch: mutate freely, source untouched
        branch = table.clone(f"{base}/experiment")
        branch.delete_by_key(
            orders.where(F.col("k") % 3 == 0).select("k"), ["k"], retries=2
        )
        print(
            "rows — source:", table.read().count(),
            "branch:", branch.read().count(),
        )

        # 3. declarative quality report over the live table (one scan)
        V.validate(
            table.read(),
            gates + [V.in_set_ratio("status", ["F", "O", "P"], at_least=1.0)],
        ).orderBy("check_name").show(truncate=False)

        # 4. runtime Bloom filter: selective dim -> pruned fact join
        urgent = t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
        revenue = (
            bloom_semi_join(t["lineitem"], urgent, "l_orderkey", "o_orderkey")
            .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
                 .cast("double").alias("urgent_revenue"))
        )
        revenue.show()

    spark.stop()


if __name__ == "__main__":
    main()
