"""Skew handling: salted aggregation and salted broadcast-side join.

At 100 TB a handful of hot keys (one viral foreign_id, one dominant
event_type) can stall a shuffle stage. AQE's skew-join splitting
(spark.sql.adaptive.skewJoin, on by default in session.py) covers
sort-merge joins; these helpers cover the remaining cases:

- salted_agg: two-phase aggregation — per-(key, salt) partial then per-key
  final — caps any single reducer's input at ~1/num_salts of the hot key.
- salted_join: replicate the small side num_salts times so a skewed big
  side spreads each hot key over num_salts reducers.

Both are pure DataFrame compositions: Catalyst still sees hash
aggregations/joins and applies partial aggregation and pushdown.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: Callable[[], list[Column]],
    merges: Callable[[], list[Column]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs()`` builds the partial aggregate columns, ``merges()`` the
    re-aggregation of those partials (e.g. partial count -> sum of counts).
    Factories (not lists) because Column objects are plan-bound.

    Example:
        salted_agg(ev, ["event_type"],
                   aggs=lambda: [F.count(F.lit(1)).alias("n")],
                   merges=lambda: [F.sum("n").cast("long").alias("n")])
    """
    salted = df.withColumn(_SALT, F.pmod(F.crc32(F.concat_ws("|", *keys)) + F.spark_partition_id(), F.lit(num_salts)))
    partial = salted.groupBy(*keys, _SALT).agg(*aggs())
    return partial.groupBy(*keys).agg(*merges()).drop(_SALT)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof join: salt the big side, replicate the small side.

    Both sides must expose the join key under the same column name
    (rename before calling). Each big-side row gets a deterministic salt;
    the small side is exploded num_salts times so every (key, salt) bucket
    finds its match. Use when the big side's key distribution is
    heavy-tailed and the small side is small but above the broadcast
    threshold.
    """
    big_s = big.withColumn(
        _SALT,
        F.pmod(
            F.crc32(F.col(key).cast("string")) + F.spark_partition_id(),
            F.lit(num_salts),
        ),
    )
    small_r = small.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))))
    return big_s.join(small_r, [key, _SALT], how).drop(_SALT)
