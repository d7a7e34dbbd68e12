"""G2 gap filling, G3 head cache, G4 insert notifier.

Mirrors the reference behaviors: rsql/gapfill.go (noop fill of persistent
holes, idempotent under racing writers), rsql/rcache.go (read-through head
cache, bounded, consecutive-id integrity, global disable), and
rsql/eventstable.go:507-571 (insert notifier waking parked pollers).
"""

from __future__ import annotations

import threading
import time

import pytest

from reflex_spark.sources.event_log import EVENT_SCHEMA, EventLog, Gap
from reflex_spark.sources.gapfill import fill_gaps
from reflex_spark.sources.head_cache import ErrConsecEvent, HeadCache
from reflex_spark.sources.manifest_log import ManifestEventLog
from reflex_spark.sources.memory import EPOCH, make_events, seed_log
from reflex_spark.streaming import (
    Consumer,
    ErrHeadReached,
    MemCursorStore,
    Spec,
    StreamOptions,
    run,
)
from reflex_spark.streaming.notify import InMemNotifier, StubNotifier


def _write_raw(spark, path: str, ids: list[int], foreign_id: str = "x"):
    """Simulate a crashed multi-file append: commit files with explicit
    ids directly, skipping append()'s dense assignment."""
    rows = [(i, 1, foreign_id, EPOCH, None, None) for i in ids]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("append").parquet(path)


def _consume_ids(spec, **kwargs) -> list[int]:
    got: list[int] = []
    spec.consumer.fn = lambda df, meta: got.extend(
        r["event_id"] for r in df.select("event_id").collect()
    )
    with pytest.raises(ErrHeadReached):
        run(spec, **kwargs)
    return got


# -- G2: gap filling -------------------------------------------------------


def test_gap_blocks_without_filler_and_fills_with(spark, tmp_path):
    log = seed_log(spark, str(tmp_path / "log"), [(1, f"u{i}") for i in range(3)])
    _write_raw(spark, log.path, [5, 6])  # id 4 lost by a crashed writer

    # without a filler, the dense guard stops at the hole (G1 semantics)
    got = _consume_ids(
        Spec(log, MemCursorStore(), Consumer("nofill", lambda df, m: None),
             StreamOptions(to_head=True))
    )
    assert got == [1, 2, 3]

    # with the filler registered, the hole is noop-filled and the stream
    # proceeds to the true head; the noop itself is dropped from delivery
    fill_gaps(log, grace_seconds=0.2, recheck_interval=0.05)
    spec = Spec(log, MemCursorStore(), Consumer("fill", lambda df, m: None),
                StreamOptions(to_head=True))
    got = _consume_ids(spec)
    assert got == [1, 2, 3, 5, 6]
    assert spec.cstore.get_cursor("fill") == 6
    noops = log.read().where("foreign_id = '0' AND event_type = 0").collect()
    assert [r["event_id"] for r in noops] == [4]


def test_gap_fill_keeps_racing_writers_row(spark, tmp_path):
    """A row committed during the grace wait is kept; only truly-missing
    ids are noop-filled (reference gapfill.go:86-90 dup-entry tolerance)."""
    log = seed_log(spark, str(tmp_path / "log"), [(1, "a"), (1, "b"), (1, "c")])
    _write_raw(spark, log.path, [6])  # ids 4,5 missing
    fill = fill_gaps(log, grace_seconds=0.0)
    _write_raw(spark, log.path, [4], foreign_id="late")  # lands "during" grace
    fill(Gap(prev=3, next=6))
    rows = {r["event_id"]: r["foreign_id"] for r in log.read().collect()}
    assert rows[4] == "late"  # racing writer won
    assert rows[5] == "0"  # noop-filled
    # re-emitting the same gap is a no-op (idempotent)
    fill(Gap(prev=3, next=6))
    assert log.read().where("event_id = 5").count() == 1


def test_manifest_log_refuses_gap_fill(spark, tmp_path):
    log = ManifestEventLog(spark, str(tmp_path / "mlog"))
    log.append(make_events(spark, [(1, "a")]))
    with pytest.raises(NotImplementedError, match="cannot have id holes"):
        log.fill_noops([99])


# -- G4: insert notifier ---------------------------------------------------


def test_inmem_notifier_one_shot_and_unsubscribe():
    n = InMemNotifier()
    a, b = n.subscribe(), n.subscribe()
    c = n.subscribe()
    n.unsubscribe(c)
    n.notify()
    assert a.is_set() and b.is_set() and not c.is_set()
    d = n.subscribe()  # fresh subscription requires a fresh notify
    assert not d.is_set()
    n.notify()
    assert d.is_set()


def test_stub_notifier_never_fires():
    n = StubNotifier()
    ev = n.subscribe()
    n.notify()
    assert not ev.is_set()


def test_append_wakes_parked_poller(spark, tmp_path):
    """A poller at head parks on the notifier; an append wakes it well
    before the (deliberately huge) poll backoff would."""
    log = EventLog(spark, str(tmp_path / "log"), notifier=InMemNotifier())
    got: list[int] = []
    spec = Spec(
        log,
        MemCursorStore(),
        Consumer("parked", lambda df, m: got.extend(
            r["event_id"] for r in df.select("event_id").collect()
        )),
        StreamOptions(poll_backoff=30.0),  # sleep path would take 30s
    )

    def produce():
        time.sleep(0.5)
        log.append(make_events(spark, [(1, "a"), (1, "b")]))

    t = threading.Thread(target=produce)
    start = time.monotonic()
    t.start()
    run(spec, max_batches=1)
    t.join()
    elapsed = time.monotonic() - start
    assert got == [1, 2]
    assert elapsed < 15.0, f"poller slept the blind backoff ({elapsed:.1f}s)"
    assert log.notifier.notify_count == 1


# -- G3: head cache --------------------------------------------------------


def _run_through(cache, name: str, batch_limit: int = 10) -> list[int]:
    spec = Spec(cache, MemCursorStore(), Consumer(name, lambda df, m: None),
                StreamOptions(to_head=True, batch_limit=batch_limit))
    return _consume_ids(spec)


def test_head_cache_serves_followers_from_one_load(spark, tmp_path):
    log = seed_log(spark, str(tmp_path / "log"), [(1, f"u{i}") for i in range(30)])
    cache = HeadCache(log, limit=100)
    try:
        lead = _run_through(cache, "lead")
        assert lead == list(range(1, 31))
        # leader: read-through on the first poll + the final empty poll
        assert cache.misses == 2
        assert cache.hits == 2  # polls 2 and 3 (batch_limit 10, 30 events)

        follower = _run_through(cache, "follower")
        assert follower == lead
        # follower windows [1-10],[11-20],[21-30] all hit; only the final
        # past-tail empty poll reads through
        assert cache.hits == 5
        assert cache.misses == 3
    finally:
        cache.invalidate()


def test_head_cache_disabled_is_passthrough(spark, tmp_path):
    log = seed_log(spark, str(tmp_path / "log"), [(1, f"u{i}") for i in range(5)])
    cache = HeadCache(log, limit=100)
    HeadCache.disabled = True
    try:
        got = _run_through(cache, "direct")
        assert got == [1, 2, 3, 4, 5]
        assert cache.hits == 0
    finally:
        HeadCache.disabled = False
        cache.invalidate()


def test_head_cache_never_caches_past_a_hole(spark, tmp_path):
    """Cached windows are dense by construction, so a hit can never serve
    rows from beyond a gap; after the filler closes the hole the next poll
    misses and reloads (the rcache gap→re-init contract)."""
    log = seed_log(spark, str(tmp_path / "log"), [(1, f"u{i}") for i in range(3)])
    _write_raw(spark, log.path, [5])  # id 4 missing
    fill_gaps(log, grace_seconds=0.1, recheck_interval=0.05)
    cache = HeadCache(log, limit=100)
    try:
        got = _run_through(cache, "c", batch_limit=2)
        assert got == [1, 2, 3, 5]
        assert log.read().where("event_id = 4 AND foreign_id = '0'").count() == 1
    finally:
        cache.invalidate()


def test_head_cache_rejects_non_consecutive_window(spark, tmp_path):
    class HoleyLog:
        """A log whose read_after ignores dense_only (contract violation)."""

        def __init__(self, inner):
            self.inner = inner

        def read_after(self, after, limit=None, dense_only=False):
            return self.inner.read_after(after, limit, dense_only=False)

    log = seed_log(spark, str(tmp_path / "log"), [(1, "a")])
    _write_raw(spark, log.path, [3])  # hole at 2
    cache = HeadCache(HoleyLog(log), limit=10)
    with pytest.raises(ErrConsecEvent):
        cache.read_after(0, 10)
