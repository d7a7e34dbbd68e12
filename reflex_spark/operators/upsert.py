"""Upsert (MERGE) for parquet sinks with deterministic conflict resolution.

Reference parity: the dead-letter error table upserts by (consumer,
event_id) keeping a stable identity (rsql/db.go:300-339, SURVEY.md §4
custom-work 3). Plain parquet can't rewrite in place, so the engine
offers three tiers:

- append + ``latest_by_key`` view      — O(append) writes, dedup on read
  (how streaming/patterns.py records consumer errors), compacted lazily;
- ``merge_rewrite``                    — batch MERGE: full-outer combine of
  base and updates, rewrite to a new directory (atomic at directory-swap
  level);
- ``sources/tx_table.TxTable``         — the real transactional path
  (round 4): commit log, snapshot isolation, optimistic concurrency, and
  file-level copy-on-write ``merge_by_key`` that rewrites only touched
  files — the engine's own MERGE INTO.

At 100 TB merge_rewrite is run per partition (date/shard) so only touched
partitions rewrite — pass the partition subdirectory as ``base_path``;
TxTable.merge_by_key already has that touched-files-only cost profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_by_key(df: DataFrame, keys: list[str], version_col: str) -> DataFrame:
    """One row per key: the highest version_col wins; ties broken by the
    remaining columns' max to stay deterministic."""
    order = [F.col(version_col).desc()] + [F.col(c).desc() for c in df.columns if c not in keys and c != version_col]
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def merge_rewrite(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    keys: list[str],
    version_col: str,
    out_path: str,
) -> DataFrame:
    """MERGE: rows in updates replace base rows with the same key (when
    newer by version_col); unmatched update rows insert. Writes the merged
    table to out_path and returns it."""
    import os

    if os.path.exists(base_path):
        base = spark.read.parquet(base_path)
        merged = latest_by_key(base.unionByName(updates), keys, version_col)
    else:
        merged = latest_by_key(updates, keys, version_col)
    merged.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
