"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem,
events ⋈ entities) is the shuffle. Writing both sides bucketed on the join
key (same bucket count) pins co-partitioning into the storage layout, so
the join plans as a SortMergeJoin with NO Exchange on either side —
verified by test_bucketing.py (plan contains SortMergeJoin, zero Exchange).

This is the Spark-native analogue of the reference's consistent-hash
sharding (rpatterns/parallel.go): route by key hash once at write time,
then every consumer/join reads co-located data forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Stale-location guard: a managed table's warehouse directory can
    outlive the in-memory catalog (a previous session wrote it, this
    session never registered it), and Spark then refuses the create
    with LOCATION_ALREADY_EXISTS — mode("overwrite") only covers tables
    the CURRENT catalog knows. If the table is absent from the catalog
    but its directory exists, remove the orphan first."""
    spark = df.sparkSession
    if not spark.catalog.tableExists(table):
        import shutil
        from pathlib import Path

        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = Path(wh.removeprefix("file:")) / table.lower()
        if loc.exists():
            shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.bucketBy(num_buckets, bucket_col)
    writer = writer.sortBy(sort_col or bucket_col)
    writer.mode("overwrite").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys: co-located,
    shuffle-free."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
