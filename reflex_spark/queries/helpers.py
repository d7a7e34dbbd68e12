"""Shared determinism helpers for the judged queries.

Rationale (also in the package docstring): double-precision sums depend on
addition order, which Spark's shuffle does not fix. Casting each addend to a
decimal makes the sum exact and order-independent, and both Spark and DuckDB
round a given double to the same nearest decimal, so `decimal-sum → double`
is bit-identical across engines regardless of parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent double sum: sum(cast(x as decimal(18,6))) as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent average: decimal-sum / count — one IEEE division."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) AS {alias}"
