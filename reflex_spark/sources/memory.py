"""Test/mock event sources (reference testutil.go:10-47, testmock/stream.go).

``make_events`` builds an event DataFrame with the canonical schema (no
event_id — EventLog.append assigns ids); ``seed_log`` creates a fresh
EventLog in a temp dir. Used by the pytest suite the way the reference uses
NewMockStream / testmock's insertable in-memory log.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from reflex_spark.sources.event_log import EVENT_SCHEMA, EventLog

_APPEND_SCHEMA = StructType([f for f in EVENT_SCHEMA.fields if f.name != "event_id"])

EPOCH = datetime(2024, 1, 1)


def make_events(
    spark: SparkSession,
    rows: list[tuple[int, str]],
    start: datetime = EPOCH,
    step_seconds: float = 1.0,
) -> DataFrame:
    """rows = [(event_type, foreign_id), ...] with evenly spaced timestamps."""
    data = [
        (etype, fid, start + timedelta(seconds=i * step_seconds), None, None)
        for i, (etype, fid) in enumerate(rows)
    ]
    return spark.createDataFrame(data, _APPEND_SCHEMA)


def seed_log(spark: SparkSession, path: str, rows: list[tuple[int, str]], **kwargs) -> EventLog:
    log = EventLog(spark, path)
    if rows:
        log.append(make_events(spark, rows, **kwargs))
    return log
