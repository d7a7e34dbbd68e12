"""Single-pass data-quality validation: declarative expectations over one scan.

A 100 TB training pipeline cannot afford one table scan per quality check —
completeness, uniqueness, value ranges, and format conformance must all come
out of a SINGLE aggregation pass whose partials combine map-side (the Deequ
model: metrics are algebraic aggregates, constraints are predicates over the
computed metrics, so validation costs exactly one job regardless of how many
expectations are attached). The reference engine validates events
structurally at ingest (typed decode of the event payload,
rsql/events.go); table-level expectations extend that contract to the batch
corpus the way the brief's pipeline operators require.

Design:

- an ``Expectation`` pairs a Spark aggregate expression with its
  DuckDB-equivalent SQL text (the oracle twin is GENERATED from the same
  list, so the judged query cannot drift from its oracle) and an optional
  inclusive [lo, hi] bound the metric must fall in;
- ``validate(df, exps)`` computes every metric in ONE ``df.agg(...)`` —
  counts, conditional counts, min/max, and decimal sums are all
  map-side-combinable; exact uniqueness adds the one unavoidable
  distinct-aggregate expansion, still a single pass over the data — then
  explodes the 1-row result into the report frame
  ``(check_name, metric_value double, passed 0/1)``. No collect: the
  metric row never leaves the cluster;
- determinism: every ratio is an INT/INT division performed once on exact
  counts (one IEEE division, identical in Spark and DuckDB); means go
  through the decimal-sum recipe (helpers.DEC); bounds are inclusive
  comparisons of doubles against double literals rendered identically into
  both plans.

Scale posture: the whole suite is one scan + one (tiny) shuffle for the
distinct aggregates; adding an expectation adds an aggregate expression,
never a pass. For trillion-row tables where exact uniqueness is too hot,
``is_unique(col, approx=True)`` swaps in ``approx_count_distinct`` — the
scale path — at the cost of leaving the oracle envelope (approx
expectations carry ``sql_metric=None`` and must be pinned by in-query
assertions instead).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reflex_spark.queries.helpers import DEC


@dataclass(frozen=True)
class Expectation:
    """One quality check: an aggregate metric plus the bound it must meet.

    ``metric`` is a zero-arg factory producing the Spark aggregate
    expression (LAZY: Column construction needs an active SparkContext,
    but expectation lists — and the oracle SQL generated from them — must
    be buildable at import time); ``sql_metric`` is the DuckDB-equivalent
    aggregate text (None for approx metrics with no exact SQL twin).
    ``lo``/``hi`` are INCLUSIVE bounds; None means unbounded on that side
    (a bound-free expectation is a pure profile metric and always passes).
    """

    name: str
    metric: Callable[[], Column]
    sql_metric: str | None
    lo: float | None = None
    hi: float | None = None


def _ratio(num: Column, den: Column) -> Column:
    # try_divide, not `/`: under Spark 4's default ANSI mode a plain
    # division throws DIVIDE_BY_ZERO on an empty frame — the audit would
    # crash on exactly the degenerate input it exists to judge. try_divide
    # yields NULL there, which is also DuckDB's x/0 result (exact oracle
    # parity), and _passed fails closed on a NULL metric.
    return F.try_divide(num.cast("double"), den)


def is_complete(col: str, at_least: float = 1.0) -> Expectation:
    """Fraction of rows with ``col`` non-null must be >= at_least."""
    return Expectation(
        name=f"complete({col})",
        metric=lambda: _ratio(F.count(F.col(col)), F.count(F.lit(1))),
        sql_metric=f"CAST(COUNT({col}) AS DOUBLE) / COUNT(*)",
        lo=at_least,
    )


def is_unique(col: str, at_least: float = 1.0, approx: bool = False) -> Expectation:
    """distinct(col)/count(*) must be >= at_least (1.0 = primary key).

    ``approx=True`` is the trillion-row path: HLL instead of the exact
    distinct expansion; it has no exact SQL twin (sql_metric=None), so use
    it outside oracle-judged flows or pin it with envelope assertions.
    """
    if approx:
        return Expectation(
            name=f"unique~({col})",
            metric=lambda: _ratio(F.approx_count_distinct(col), F.count(F.lit(1))),
            sql_metric=None,
            lo=at_least,
        )
    return Expectation(
        name=f"unique({col})",
        metric=lambda: _ratio(F.countDistinct(F.col(col)), F.count(F.lit(1))),
        sql_metric=f"CAST(COUNT(DISTINCT {col}) AS DOUBLE) / COUNT(*)",
        lo=at_least,
    )


def has_min(col: str, lo: float | None = None, hi: float | None = None) -> Expectation:
    return Expectation(
        name=f"min({col})",
        metric=lambda: F.min(F.col(col)),
        sql_metric=f"MIN({col})",
        lo=lo,
        hi=hi,
    )


def has_max(col: str, lo: float | None = None, hi: float | None = None) -> Expectation:
    return Expectation(
        name=f"max({col})",
        metric=lambda: F.max(F.col(col)),
        sql_metric=f"MAX({col})",
        lo=lo,
        hi=hi,
    )


def has_mean(col: str, lo: float | None = None, hi: float | None = None) -> Expectation:
    """Decimal-summed mean (order-independent; bit-equal across engines)."""
    return Expectation(
        name=f"mean({col})",
        metric=lambda: F.try_divide(
            F.sum(F.col(col).cast(DEC)).cast("double"), F.count(F.col(col))
        ),
        sql_metric=(
            f"CAST(SUM(CAST({col} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({col})"
        ),
        lo=lo,
        hi=hi,
    )


def matches_ratio(col: str, pattern: str, at_least: float) -> Expectation:
    """Fraction of ALL rows whose ``col`` matches ``pattern`` (null = no
    match). Keep patterns inside the Java∩RE2 common dialect — character
    classes, anchors, quantifiers — so Spark and DuckDB agree."""
    # The pattern is interpolated into the generated oracle as a SQL
    # string literal; a single quote would break the oracle (or make it
    # diverge from the safe Spark rlike side), so escape it SQL-style.
    sql_pattern = pattern.replace("'", "''")
    return Expectation(
        name=f"matches({col})",
        metric=lambda: _ratio(
            F.sum(
                F.when(F.col(col).cast("string").rlike(pattern), 1).otherwise(0)
            ),
            F.count(F.lit(1)),
        ),
        sql_metric=(
            f"CAST(SUM(CASE WHEN regexp_matches(CAST({col} AS VARCHAR), "
            f"'{sql_pattern}') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)"
        ),
        lo=at_least,
    )


def in_set_ratio(col: str, values: list[str], at_least: float) -> Expectation:
    """Fraction of ALL rows whose ``col`` is one of ``values``."""
    # SQL-escape embedded quotes so the generated oracle stays parseable
    # and equal to the Spark isin() side for values like "o'brien".
    quoted = ", ".join("'" + v.replace("'", "''") + "'" for v in values)
    return Expectation(
        name=f"in_set({col})",
        metric=lambda: _ratio(
            F.sum(F.when(F.col(col).isin(values), 1).otherwise(0)),
            F.count(F.lit(1)),
        ),
        sql_metric=(
            f"CAST(SUM(CASE WHEN {col} IN ({quoted}) THEN 1 ELSE 0 END) "
            f"AS DOUBLE) / COUNT(*)"
        ),
        lo=at_least,
    )


def has_size(lo: float | None = None, hi: float | None = None) -> Expectation:
    return Expectation(
        name="size()",
        metric=lambda: F.count(F.lit(1)),
        sql_metric="COUNT(*)",
        lo=lo,
        hi=hi,
    )


def _passed(metric: Column, e: Expectation) -> Column:
    if e.lo is None and e.hi is None:
        return F.lit(True)  # profile-only expectation
    ok = F.lit(True)
    if e.lo is not None:
        ok = ok & (metric >= F.lit(float(e.lo)))
    if e.hi is not None:
        ok = ok & (metric <= F.lit(float(e.hi)))
    # NULL metric (empty frame / all-NULL column) FAILS a bounded
    # expectation — the gate fails closed on degenerate input
    return F.coalesce(ok, F.lit(False))


def validate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate every expectation in ONE aggregation pass over ``df``.

    Returns ``(check_name string, metric_value double, passed long 0/1)``,
    one row per expectation, in no guaranteed order (sort downstream).
    """
    if not expectations:
        raise ValueError("validate() needs at least one expectation")
    row = df.agg(
        *[
            e.metric().cast("double").alias(f"__m{i}")
            for i, e in enumerate(expectations)
        ]
    )
    structs = [
        F.struct(
            F.lit(e.name).alias("check_name"),
            F.col(f"__m{i}").alias("metric_value"),
            _passed(F.col(f"__m{i}"), e).cast("long").alias("passed"),
        )
        for i, e in enumerate(expectations)
    ]
    return row.select(F.inline(F.array(*structs)))


def sql_validate(table: str, expectations: list[Expectation]) -> str:
    """DuckDB oracle twin of ``validate`` — generated from the SAME
    expectation list so the two cannot drift. Raises on approx
    expectations (sql_metric=None): those have no exact SQL form."""
    for e in expectations:
        if e.sql_metric is None:
            raise ValueError(f"expectation {e.name!r} has no exact SQL twin")
    metrics = ", ".join(
        f"CAST({e.sql_metric} AS DOUBLE) AS __m{i}"
        for i, e in enumerate(expectations)
    )
    arms = []
    for i, e in enumerate(expectations):
        conds = []
        if e.lo is not None:
            conds.append(f"__m{i} >= {float(e.lo)!r}")
        if e.hi is not None:
            conds.append(f"__m{i} <= {float(e.hi)!r}")
        # COALESCE(..., FALSE): NULL metric fails a bounded expectation —
        # mirrors _passed's fail-closed rule exactly
        passed = f"COALESCE({' AND '.join(conds)}, FALSE)" if conds else "TRUE"
        arms.append(
            f"SELECT '{e.name}' AS check_name, __m{i} AS metric_value, "
            f"CAST({passed} AS BIGINT) AS passed FROM __vmetrics"
        )
    return (
        f"WITH __vmetrics AS (SELECT {metrics} FROM {table}) "
        + " UNION ALL ".join(arms)
    )
