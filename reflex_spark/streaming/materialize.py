"""Incrementally-maintained aggregates: the streaming rollup.

The classic warehouse pattern the reference leaves to consumers (a consumer
maintaining a projection table from events): a foreachBatch consumer merges
each microbatch's partial aggregate into a persistent parquet table, so the
rollup is always queryable and each batch costs O(batch + touched keys) —
never a recompute of history.

Exactly-once: merges are idempotent per (keys, batch-partial) because the
merge key includes the group keys and values are additive under
redelivery-dedup (the batch's event-id range is recorded; a redelivered
batch id is skipped), giving effective exactly-once on at-least-once
delivery — the same recipe as the chaos tests.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class MaterializedCounts:
    """Persistent per-key (count, decimal-sum) rollup over an event stream."""

    def __init__(self, spark: SparkSession, path: str, keys: list[str], value_col: str | None = None):
        self.spark = spark
        self.path = path.rstrip("/")
        self.keys = keys
        self.value_col = value_col
        self._applied_path = f"{self.path}.applied.json"

    # -- consumer side -----------------------------------------------------

    def _applied(self) -> set[str]:
        try:
            with open(self._applied_path) as f:
                return set(json.load(f))
        except FileNotFoundError:
            return set()

    def _mark_applied(self, batch_key: str) -> None:
        applied = self._applied() | {batch_key}
        with open(self._applied_path, "w") as f:
            json.dump(sorted(applied), f)

    def apply_batch(self, batch: DataFrame, meta: dict) -> None:
        """foreachBatch/poll consumer fn: merge one batch's partials.

        Idempotent under redelivery: the batch's identity (min-max event id)
        is recorded; a seen batch is skipped.
        """
        bounds = batch.agg(
            F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
        ).collect()[0]
        if bounds["lo"] is None:
            return
        batch_key = f"{bounds['lo']}-{bounds['hi']}"
        if batch_key in self._applied():
            return

        aggs = [F.count(F.lit(1)).alias("n_events")]
        if self.value_col:
            aggs.append(
                F.sum(F.col(self.value_col).cast("decimal(18,6)")).alias("sum_value")
            )
        partial = batch.groupBy(*self.keys).agg(*aggs)

        if os.path.exists(self.path):
            current = self.spark.read.parquet(self.path)
            merged = (
                current.unionByName(partial)
                .groupBy(*self.keys)
                .agg(
                    F.sum("n_events").cast("long").alias("n_events"),
                    *(
                        [F.sum("sum_value").cast("decimal(18,6)").alias("sum_value")]
                        if self.value_col
                        else []
                    ),
                )
            )
        else:
            merged = partial.withColumn("n_events", F.col("n_events").cast("long"))
        tmp = self.path + ".staging"
        merged.write.mode("overwrite").parquet(tmp)
        old = self.path + ".old"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.exists(old):
            import shutil

            shutil.rmtree(old)
        self._mark_applied(batch_key)

    # -- query side --------------------------------------------------------

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)
