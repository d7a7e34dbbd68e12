"""Streaming windowed operators: watermarks, sessions, dedup, custom state.

Pattern: write a temp event log, run each streaming transform with
AvailableNow into a memory sink, assert the aggregate contents.
"""

from __future__ import annotations

from datetime import timedelta

import pytest

from reflex_spark.sources.memory import EPOCH, make_events, seed_log
from reflex_spark.streaming.windows import (
    dedup_within_watermark,
    running_count_per_key,
    session_counts,
    sliding_counts,
    tumbling_counts,
)


def run_to_memory(df, name: str, output_mode: str, spark):
    # complete mode for window aggs: append only emits watermark-closed
    # windows, which an AvailableNow drain never reaches for the tail.
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_counts_stream(spark, tmp_path):
    # 10 events at 20-minute spacing: hours 0,1,2 get 3/3/3+1 events
    log = seed_log(
        spark, str(tmp_path / "log"), [(1, "k")] * 10, step_seconds=1200
    )
    out = run_to_memory(
        tumbling_counts(log.read_stream(), "1 hour"), "tumbling_t", "complete", spark
    )
    rows = {r["window_start"].minute: r["n_events"] for r in out.collect()}
    got = sorted(r["n_events"] for r in out.collect())
    assert sum(got) == 10
    assert got == [1, 3, 3, 3]


def test_sliding_counts_stream(spark, tmp_path):
    log = seed_log(spark, str(tmp_path / "log"), [(1, "k")] * 4, step_seconds=1800)
    out = run_to_memory(
        sliding_counts(log.read_stream(), "2 hours", "1 hour"), "sliding_t", "complete", spark
    )
    # each event belongs to 2 windows
    assert sum(r["n_events"] for r in out.collect()) == 8


def test_session_counts_stream(spark, tmp_path):
    # two sessions for key "a" (gap > 30min), one for "b"
    a1 = make_events(spark, [(1, "a"), (1, "a")], start=EPOCH, step_seconds=60)
    a2 = make_events(spark, [(1, "a")], start=EPOCH + timedelta(hours=2))
    b = make_events(spark, [(1, "b")], start=EPOCH + timedelta(minutes=5))
    log = seed_log(spark, str(tmp_path / "log"), [])
    for df in (a1, a2, b):
        log.append(df)
    out = run_to_memory(
        session_counts(log.read_stream(), gap="30 minutes"), "session_t", "complete", spark
    )
    sessions = sorted((r["foreign_id"], r["n_events"]) for r in out.collect())
    assert sessions == [("a", 1), ("a", 2), ("b", 1)]


def test_dedup_within_watermark_stream(spark, tmp_path):
    log = seed_log(
        spark,
        str(tmp_path / "log"),
        [(1, "x"), (1, "x"), (2, "x"), (1, "y")],
        step_seconds=60,
    )
    out = run_to_memory(
        dedup_within_watermark(log.read_stream(), ["event_type", "foreign_id"]),
        "dedup_t",
        "append",
        spark,
    )
    keys = sorted((r["event_type"], r["foreign_id"]) for r in out.collect())
    assert keys == [(1, "x"), (1, "y"), (2, "x")]


def test_running_count_per_key_state(spark, tmp_path):
    log = seed_log(
        spark, str(tmp_path / "log"), [(1, "a"), (1, "b"), (1, "a"), (1, "a")]
    )
    out = run_to_memory(
        running_count_per_key(log.read_stream(), key_col="foreign_id"),
        "state_t",
        "update",
        spark,
    )
    counts = {r["foreign_id"]: r["n_events"] for r in out.collect()}
    assert counts == {"a": 3, "b": 1}


def test_stream_stream_join(spark, tmp_path):
    """Watermarked interval join between two event streams on foreign_id."""
    from reflex_spark.streaming.windows import stream_stream_join

    left = seed_log(spark, str(tmp_path / "left"), [(1, "u1"), (1, "u2")], step_seconds=60)
    right_rows = make_events(
        spark, [(2, "u1"), (2, "u3")], start=EPOCH + timedelta(minutes=10), step_seconds=60
    )
    right = seed_log(spark, str(tmp_path / "right"), [])
    right.append(right_rows)

    joined = stream_stream_join(
        left.read_stream(), right.read_stream(), key="foreign_id", within="1 hour"
    )
    out = run_to_memory(joined, "ssj_t", "append", spark)
    rows = [(r["l_key"], r["l_event_type"], r["r_event_type"]) for r in out.collect()]
    assert rows == [("u1", 1, 2)]  # only u1 has a right event within the hour


def test_stream_static_dimension_join(spark, tmp_path):
    """Stream-static join: streaming events enriched against a static
    dimension (broadcast per microbatch — no streaming state needed)."""
    from pyspark.sql import functions as F

    log = seed_log(spark, str(tmp_path / "log"), [(1, "u1"), (2, "u2"), (1, "u3")])
    dim = spark.createDataFrame(
        [("u1", "gold"), ("u2", "silver")], ["foreign_id", "tier"]
    )
    enriched = log.read_stream().join(F.broadcast(dim), "foreign_id", "left")
    out = run_to_memory(enriched, "ssd_t", "append", spark)
    rows = {r["foreign_id"]: r["tier"] for r in out.collect()}
    assert rows == {"u1": "gold", "u2": "silver", "u3": None}
