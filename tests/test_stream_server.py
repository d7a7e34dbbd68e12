"""Remote stream bridge tests, modeled on the reference's grpctest suite
(grpctest/server.go:19-80, rsql/stream_test.go:40-44 10k backpressure run)."""

from __future__ import annotations

import pytest

from reflex_spark.sources.memory import seed_log
from reflex_spark.sources.stream_server import (
    StreamClient,
    StreamClientOptions,
    StreamServer,
    run_remote,
)
from reflex_spark.streaming import ErrHeadReached, MemCursorStore
from reflex_spark.streaming.run import ErrStopped


def test_stream_server_10k_backpressure(spark, tmp_path):
    """10k events through one stream in order (the reference's gRPC
    stream_test scale); small client batches exercise the send-buffer
    backpressure path."""
    n = 10_000
    log = seed_log(spark, str(tmp_path / "log"), [(1, str(i)) for i in range(n)])
    server = StreamServer(log, batch_limit=2000)
    try:
        store = MemCursorStore()
        got: list[int] = []

        def fn(batch):
            got.extend(e["event_id"] for e in batch)

        with pytest.raises(ErrHeadReached):
            run_remote(
                *server.address,
                store,
                "remote10k",
                fn,
                batch_size=500,
                options=StreamClientOptions(to_head=True),
            )
        assert got == list(range(1, n + 1))  # all events, in id order
        assert store.get_cursor("remote10k") == n
        assert server.sent_count == n
    finally:
        server.stop()


def test_stream_server_graceful_stop_and_event_shape(spark, tmp_path):
    """Server.Stop() terminates live streams with ErrStopped
    (server.go:31-42); wire events roundtrip the reflexpb.Event fields."""
    log = seed_log(spark, str(tmp_path / "log"), [(7, "fid-a"), (8, "fid-b")])
    log.insert("fid-c", 9, metadata=b"\x01\x02")
    server = StreamServer(log)
    try:
        client = StreamClient(*server.address)
        events = [client.recv() for _ in range(3)]
        assert [e["event_id"] for e in events] == [1, 2, 3]
        assert events[0]["event_type"] == 7
        assert events[0]["foreign_id"] == "fid-a"
        assert events[2]["metadata"] == b"\x01\x02"
        assert events[0]["timestamp"] is not None

        server.stop()
        with pytest.raises(ErrStopped):
            # drain until the terminal frame (server checks stop per batch)
            for _ in range(10):
                client.recv()
    finally:
        server.stop()


def test_stream_server_cursor_resume(spark, tmp_path):
    """Reconnect resumes after the locally-committed cursor — the rgrpc
    consumer contract (at-least-once, client-side cursor)."""
    log = seed_log(spark, str(tmp_path / "log"), [(1, str(i)) for i in range(6)])
    server = StreamServer(log)
    try:
        store = MemCursorStore()
        got: list[int] = []

        def crash_after_4(batch):
            got.extend(e["event_id"] for e in batch)
            if len(got) >= 4:
                raise RuntimeError("consumer crash")

        with pytest.raises(RuntimeError, match="consumer crash"):
            run_remote(
                *server.address,
                store,
                "res",
                crash_after_4,
                batch_size=2,
                options=StreamClientOptions(to_head=True),
            )
        assert store.get_cursor("res") == 2  # only the first batch committed

        def ok(batch):
            got.extend(e["event_id"] for e in batch)

        with pytest.raises(ErrHeadReached):
            run_remote(
                *server.address,
                store,
                "res",
                ok,
                batch_size=2,
                options=StreamClientOptions(to_head=True),
            )
        # batch [3,4] redelivered (at-least-once), then 5, 6
        assert got == [1, 2, 3, 4, 3, 4, 5, 6]
        assert store.get_cursor("res") == 6
    finally:
        server.stop()
