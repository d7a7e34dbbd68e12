"""Chaos tests: kill/restart mid-stream, duplicate delivery + idempotent
sinks → effective exactly-once (SURVEY.md §5 test-plan item: the
TestRandomGaps analogue for Spark's model)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reflex_spark import testkit
from reflex_spark.sources.event_log import EventLog
from reflex_spark.sources.memory import seed_log
from reflex_spark.streaming import (
    Consumer,
    ErrHeadReached,
    FileCursorStore,
    MemCursorStore,
    Spec,
    StreamOptions,
    run,
)
from reflex_spark.streaming.run import run_stream


def test_conformance_helpers(spark, tmp_path):
    log = EventLog(spark, str(tmp_path / "log"))
    testkit.check_event_log(log)
    testkit.check_cursor_store(MemCursorStore())
    testkit.check_cursor_store(FileCursorStore(str(tmp_path / "cur")))
    testkit.check_consume_contract(log, MemCursorStore())


def test_crash_loop_idempotent_sink_exactly_once(spark, tmp_path):
    """Consumer crashes on every other batch; sink dedups by event_id →
    effective exactly-once despite redeliveries."""
    log = seed_log(spark, str(tmp_path / "log"), [(1, str(i)) for i in range(10)])
    store = FileCursorStore(str(tmp_path / "cur"))
    sink_path = str(tmp_path / "sink")
    crash = {"n": 0}

    def fn(df, meta):
        crash["n"] += 1
        # write first (side effect lands), THEN maybe crash — the worst case
        df.select("event_id", "foreign_id").write.mode("append").parquet(sink_path)
        if crash["n"] % 2 == 1:
            raise RuntimeError("chaos crash")

    spec = Spec(log, store, Consumer("chaos", fn), StreamOptions(to_head=True, batch_limit=3))
    for _ in range(12):
        try:
            run(spec)
            break
        except ErrHeadReached:
            break
        except Exception:
            continue
    assert store.get_cursor("chaos") == 10
    raw = spark.read.parquet(sink_path)
    assert raw.count() > 10  # duplicates really happened (at-least-once)
    dedup = raw.dropDuplicates(["event_id"])
    assert dedup.count() == 10  # idempotent read → exactly-once effect
    assert sorted(r["event_id"] for r in dedup.collect()) == list(range(1, 11))


def test_stream_restart_mid_processing(spark, tmp_path):
    """Structured Streaming path: kill the query after the first batch of
    files, restart with the same checkpoint → no loss, no reprocess."""
    log = seed_log(spark, str(tmp_path / "log"), [(1, str(i)) for i in range(4)])
    ckpt = str(tmp_path / "ckpt")
    sink_path = str(tmp_path / "sink")

    def fn(df, meta):
        df.select("event_id").write.mode("append").parquet(sink_path)

    spec = Spec(log, MemCursorStore(), Consumer("sr", fn))
    run_stream(spec, ckpt, available_now=True)
    # new events while "down"
    log.insert("late1", 1)
    log.insert("late2", 1)
    run_stream(spec, ckpt, available_now=True)
    got = sorted(r["event_id"] for r in spark.read.parquet(sink_path).collect())
    assert got == [1, 2, 3, 4, 5, 6]  # each exactly once across restarts
