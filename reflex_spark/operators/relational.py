"""Relational operators Spark lacks as single calls: as-of join, top-k helper.

These compose existing DataFrame ops (SURVEY.md §4: "no custom Catalyst rules
needed") so Catalyst still sees a declarative plan — pushdown, AQE and
codegen all apply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k(df: DataFrame, k: int, *order_cols: Column) -> DataFrame:
    """Deterministic top-k. Callers must include a unique tie-break column.

    Spark plans ``orderBy().limit(k)`` as TakeOrderedAndProject: each task
    keeps a k-row heap and the driver merges per-partition heaps — no global
    sort/shuffle, so this is safe at 100 TB for small k.
    """
    return df.orderBy(*order_cols).limit(k)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_tiebreak: str,
    left_row_id: str,
    direction: str = "backward",
    how: str = "inner",
) -> DataFrame:
    """As-of join: for each left row, the single latest right row with
    ``right_time <= left_time`` (direction="backward") on the same key.

    Implementation: equi-join on the key with the time bound as a join
    predicate, then ``row_number() == 1`` per left row ordered by
    (right_time DESC, right_tiebreak DESC). The equi-join keeps this a plain
    shuffled/broadcast hash join for Catalyst (not a blown-up range join);
    AQE handles skewed keys. The tie-break makes the result deterministic
    when multiple right rows share the boundary timestamp.

    At 100 TB: the fan-out is bounded by rows-per-key on the right; for
    high-churn keys, pre-aggregate the right side per (key, time) first.
    """
    if direction == "backward":
        cond = F.col(right_time) <= F.col(left_time)
        order = [F.col(right_time).desc(), F.col(right_tiebreak).desc()]
    elif direction == "forward":
        cond = F.col(right_time) >= F.col(left_time)
        order = [F.col(right_time).asc(), F.col(right_tiebreak).asc()]
    else:
        raise ValueError(f"unknown direction: {direction}")

    joined = left.join(right, (F.col(left_key) == F.col(right_key)) & cond, how)
    w = Window.partitionBy(left_row_id).orderBy(*order)
    return (
        joined.withColumn("__asof_rn", F.row_number().over(w))
        .where(F.col("__asof_rn") == 1)
        .drop("__asof_rn")
    )
