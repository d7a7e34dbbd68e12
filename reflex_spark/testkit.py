"""Conformance helpers for downstream applications.

Reference parity (SURVEY.md §5.4): the reference exports
rsql.TestEventsTable / TestCursorsTable (rsql/testutil.go:21-71) so apps can
validate their own table wiring. These are the engine's equivalents: call
them from an app's test suite against its own EventLog/CursorStore/consumer
to verify the core contracts hold with the app's configuration.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reflex_spark.sources.event_log import EventLog
from reflex_spark.streaming.consumer import Consumer
from reflex_spark.streaming.cursors import CursorRegressionError, CursorStore
from reflex_spark.streaming.run import ErrHeadReached, Spec, StreamOptions, run


def check_event_log(log: EventLog) -> None:
    """Validate an EventLog wiring: insert → dense ids → ordered scan
    (reference rsql.TestEventsTable)."""
    base = log.head()
    log.insert("conformance-a", 1)
    log.insert("conformance-b", 2)
    head = log.head()
    assert head == base + 2, f"ids not dense: head {base} -> {head}"
    rows = log.read_after(base).collect()
    ids = [r["event_id"] for r in rows]
    assert ids == sorted(ids), f"scan not id-ordered: {ids}"
    assert ids == list(range(base + 1, head + 1)), f"gap in ids: {ids}"
    fids = [r["foreign_id"] for r in rows]
    assert fids == ["conformance-a", "conformance-b"], f"payload mismatch: {fids}"


def check_cursor_store(store: CursorStore, consumer: str = "conformance") -> None:
    """Validate a CursorStore: default-zero, persistence, monotonic guard
    (reference rsql.TestCursorsTable; guard per rsql/db.go:265-291)."""
    assert store.get_cursor(consumer) in (0, store.get_cursor(consumer))
    start = store.get_cursor(consumer)
    store.set_cursor(consumer, start + 10)
    assert store.get_cursor(consumer) == start + 10, "cursor not persisted"
    try:
        store.set_cursor(consumer, start + 5)
    except CursorRegressionError:
        pass
    else:
        raise AssertionError("cursor regression not rejected")
    store.flush()


def check_consume_contract(log: EventLog, store: CursorStore, name: str = "conformance-run") -> None:
    """Validate the at-least-once consume contract end-to-end: all events
    after the cursor are delivered in order exactly until head."""
    seen: list[int] = []

    def fn(df, meta):
        seen.extend(r["event_id"] for r in df.select("event_id").orderBy("event_id").collect())

    start = store.get_cursor(name)
    spec = Spec(log, store, Consumer(name, fn), StreamOptions(to_head=True))
    try:
        run(spec)
    except ErrHeadReached:
        pass
    expected = [
        r["event_id"]
        for r in log.read().where(F.col("event_id") > start).orderBy("event_id").collect()
    ]
    assert seen == expected, f"delivery mismatch: saw {len(seen)}, expected {len(expected)}"
    assert store.get_cursor(name) == log.head(), "cursor not at head after to_head run"
