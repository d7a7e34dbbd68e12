"""Consumer: named business-logic callback over event batches.

Reference parity (consumer.go:116-194):
- name + callback + options (include-type filter, event filter, recovery fn)
- skipped/errored/consumed counters (the reference's prometheus metrics,
  internal/metrics/metrics.go, surfaced as plain counters + a stats dict)
- at-least-once contract: the callback must be idempotent.

The callback operates on a *batch* DataFrame (Spark's natural granularity,
foreachBatch); `row_consumer` adapts a per-event callable to batch form by
running it inside executors via mapInPandas — never a driver-side loop.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ConsumerError(RuntimeError):
    """Wraps a consumer callback failure (reference errors.go:57-64)."""


class FilterError(RuntimeError):
    """Wraps an event-filter failure (reference errors.go filterErr /
    IsFilterErr): a filter that cannot be applied (bad column/expression)
    is distinguished from business-logic failures so callers can route it
    (filter bugs are permanent; consume bugs may be transient)."""


@dataclass
class Consumer:
    """A named consumer of event batches.

    fn(batch_df, batch_meta) is called once per batch/microbatch; raising
    fails the run (fail-fast, reference README: "Errors always result in
    the consumer getting stuck").
    """

    name: str
    fn: Callable[[DataFrame, dict[str, Any]], None]
    include_types: Sequence[int] | None = None  # WithFilterIncludeTypes
    event_filter: Column | None = None  # WithEventFilter (pure predicate)
    recover: Callable[[DataFrame, dict, Exception], None] | None = None  # WithRecoverFunction
    stats: dict[str, int] = field(default_factory=lambda: {"batches": 0, "events": 0, "errors": 0, "recovered": 0})

    def apply_filters(self, df: DataFrame) -> DataFrame:
        try:
            if self.include_types is not None:
                df = df.where(F.col("event_type").isin(list(self.include_types)))
            if self.event_filter is not None:
                df = df.where(self.event_filter)
        except Exception as exc:  # noqa: BLE001 — classify as filter error
            raise FilterError(f"consumer {self.name}: error in filter: {exc}") from exc
        return df

    def consume(self, df: DataFrame, meta: dict[str, Any]) -> None:
        df = self.apply_filters(df)
        try:
            self.fn(df, meta)
            self.stats["batches"] += 1
        except Exception as exc:  # noqa: BLE001 — recovery hook decides
            self.stats["errors"] += 1
            if self.recover is not None:
                self.recover(df, meta, exc)
                self.stats["recovered"] += 1
                return
            raise ConsumerError(f"consumer {self.name} failed: {exc}") from exc


def row_consumer(
    fn: Callable[[dict], None],
    ok_col: str = "__consume_ok",
    error_col: str = "__consume_error",
) -> Callable[[DataFrame], DataFrame]:
    """Adapt a per-event callable into a distributed batch transform.

    Returns a function df → df + (ok, error) columns; the callable runs in
    executors over Arrow batches (reference per-event Consume,
    consumer.go:148-194). Used by best-effort / dead-letter patterns to
    split successes from failures without a driver loop.
    """
    import pandas as pd

    from pyspark.sql.types import BooleanType, StringType, StructField, StructType

    def transform(df: DataFrame) -> DataFrame:
        cols = df.columns
        out_schema = StructType(
            list(df.schema.fields)
            + [StructField(ok_col, BooleanType()), StructField(error_col, StringType())]
        )

        def run_rows(batches):
            for pdf in batches:
                oks, errs = [], []
                for row in pdf.to_dict("records"):
                    try:
                        fn(row)
                        oks.append(True)
                        errs.append(None)
                    except Exception as exc:  # noqa: BLE001 — recorded per event
                        oks.append(False)
                        errs.append(str(exc))
                pdf[ok_col] = pd.Series(oks, index=pdf.index, dtype="boolean")
                pdf[error_col] = pd.Series(errs, index=pdf.index, dtype="object")
                yield pdf

        return df.mapInPandas(run_rows, out_schema).select(*cols, ok_col, error_col)

    return transform
