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


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLE)


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
