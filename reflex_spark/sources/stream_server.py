"""Remote stream bridge: the reference's gRPC server/client pair (S4/S5)
re-expressed over a stdlib TCP socket.

Reference parity (server.go:49-107, client.go:16-35, reflexpb/reflex.proto):
- ``StreamServer`` serves the Stream RPC: a client sends one JSON request
  line ``{"after": ..., "options": {fromHead, toHead, lag}}`` (the proto's
  StreamRequest) and receives a stream of newline-delimited JSON events
  shaped like reflexpb.Event (string id, int type, foreign_id, timestamp,
  b64 metadata/trace).
- Graceful stop: ``Server.Stop()`` → every live stream terminates with an
  ``ErrStopped`` frame and new connections are refused (server.go:31-42).
- ``to_head`` exhaustion → an ``ErrHeadReached`` frame (options.go:27-39).
- Backpressure: the server thread blocks on the TCP send buffer exactly as
  gRPC streams block on their 64KB window (server.go:46-48 note) — a slow
  consumer throttles the producer, nothing is buffered unboundedly.

Why a socket and not Spark-native: cross-service consumption at scale goes
through the shared lake (any cluster reads the same EventLog path); this
bridge is the reflex-parity peer-to-peer path for small control-plane
consumers outside the cluster, throughput-bounded by one socket exactly as
the reference is bounded by one gRPC stream. The gRPC framing itself is not
reproduced (no grpc dependency in this environment); the protocol semantics
— request shape, event shape, error taxonomy, backpressure model — are.
"""

from __future__ import annotations

import base64
import json
import socket
import threading
import time
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Any, Callable

from reflex_spark.sources.event_log import EventLog


def _event_to_wire(row) -> dict[str, Any]:
    """reflexpb.Event shape (proto fields 3-8; id is a string there)."""
    ts = row["timestamp"]
    return {
        "id": str(row["event_id"]),
        "type": row["event_type"],
        "foreign_id": row["foreign_id"],
        "timestamp": int(ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000),
        "metadata": base64.b64encode(row["metadata"]).decode() if row["metadata"] else None,
        "trace": base64.b64encode(row["trace"]).decode() if row["trace"] else None,
    }


def wire_to_event(msg: dict[str, Any]) -> dict[str, Any]:
    """Decode a wire event back to engine types."""
    return {
        "event_id": int(msg["id"]),
        "event_type": msg["type"],
        "foreign_id": msg["foreign_id"],
        "timestamp": datetime.fromtimestamp(msg["timestamp"] / 1_000_000, tz=timezone.utc).replace(tzinfo=None),
        "metadata": base64.b64decode(msg["metadata"]) if msg["metadata"] else None,
        "trace": base64.b64decode(msg["trace"]) if msg["trace"] else None,
    }


class StreamServer:
    """Serve an EventLog's stream to remote consumers (reference Server).

    One thread per connection; each runs the poll loop over the log and
    writes events to the socket, blocking on the send buffer when the
    consumer is slow (backpressure). stop() is the graceful shutdown:
    live streams send an ErrStopped frame and close (server.go:31-42).
    """

    def __init__(
        self,
        log: EventLog,
        host: str = "127.0.0.1",
        port: int = 0,
        batch_limit: int = 1000,
        poll_backoff: float = 0.05,
    ):
        self.log = log
        self.batch_limit = batch_limit
        self.poll_backoff = poll_backoff
        self._stop = threading.Event()
        self._sock = socket.create_server((host, port))
        self._sock.settimeout(0.1)
        self.host, self.port = self._sock.getsockname()[:2]
        self.sent_count = 0  # grpctest sentCounter parity
        self._threads: list[threading.Thread] = []
        self._accept = threading.Thread(target=self._accept_loop, daemon=True)
        self._accept.start()

    @property
    def address(self) -> tuple[str, int]:
        return (self.host, self.port)

    def stop(self) -> None:
        """Graceful stop: streams end with ErrStopped (panics if called
        twice in the reference; idempotent here)."""
        self._stop.set()
        try:
            self._sock.close()
        except OSError:
            pass
        for t in self._threads:
            t.join(timeout=5)

    # -- internals ---------------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except (socket.timeout, OSError):
                continue
            t = threading.Thread(target=self._serve_conn, args=(conn,), daemon=True)
            t.start()
            self._threads.append(t)

    def _serve_conn(self, conn: socket.socket) -> None:
        try:
            with conn, conn.makefile("rw") as f:
                req = json.loads(f.readline())
                opts = req.get("options") or {}
                after = int(req.get("after") or 0)
                if opts.get("fromHead") and after == 0:
                    after = self.log.head()
                to_head = bool(opts.get("toHead"))
                lag = float(opts.get("lag") or 0.0)
                while True:
                    if self._stop.is_set():
                        f.write(json.dumps({"error": "stopped"}) + "\n")
                        f.flush()
                        return
                    rows = (
                        self.log.read_after(after, self.batch_limit, dense_only=True)
                        .orderBy("event_id")
                        .collect()
                    )
                    if lag:
                        # time.time() is the true epoch regardless of host
                        # TZ; utcnow().timestamp() would re-interpret the
                        # naive UTC datetime in the host zone and shift the
                        # cutoff by the UTC offset.
                        cutoff = time.time() - lag
                        head_rows = []
                        for r in rows:  # prefix-truncate at first too-recent
                            if r["timestamp"].replace(tzinfo=timezone.utc).timestamp() > cutoff:
                                break
                            head_rows.append(r)
                        rows = head_rows
                    if not rows:
                        if to_head:
                            f.write(json.dumps({"error": "head_reached"}) + "\n")
                            f.flush()
                            return
                        time.sleep(self.poll_backoff)
                        continue
                    for r in rows:
                        # write blocks on the TCP send buffer: backpressure
                        f.write(json.dumps({"event": _event_to_wire(r)}) + "\n")
                        self.sent_count += 1
                    f.flush()
                    after = rows[-1]["event_id"]
        except (BrokenPipeError, ConnectionResetError, json.JSONDecodeError, ValueError):
            return  # client went away / bad request: drop the stream


@dataclass
class StreamClientOptions:
    from_head: bool = False
    to_head: bool = False
    lag_seconds: float = 0.0


class StreamClient:
    """Client for StreamServer (reference WrapStreamPB / StreamClientPB):
    ``recv()`` returns one event dict at a time; stream-terminal frames
    raise ErrHeadReached / ErrStopped like the reference error taxonomy."""

    def __init__(self, host: str, port: int, after: int = 0, options: StreamClientOptions | None = None):
        opts = options or StreamClientOptions()
        self._sock = socket.create_connection((host, port))
        self._f = self._sock.makefile("rw")
        self._f.write(
            json.dumps(
                {
                    "after": after,
                    "options": {
                        "fromHead": opts.from_head,
                        "toHead": opts.to_head,
                        "lag": opts.lag_seconds,
                    },
                }
            )
            + "\n"
        )
        self._f.flush()
        self._closed = False

    def recv(self) -> dict[str, Any]:
        from reflex_spark.streaming.run import ErrHeadReached, ErrStopped

        if self._closed:
            raise ErrStopped("client closed")
        line = self._f.readline()
        if not line:
            self.close()
            raise ErrStopped("connection closed")
        msg = json.loads(line)
        if "error" in msg:
            self.close()
            if msg["error"] == "head_reached":
                raise ErrHeadReached("remote stream reached head")
            raise ErrStopped("remote stream stopped")
        return wire_to_event(msg["event"])

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            try:
                self._sock.close()
            except OSError:
                pass


def run_remote(
    host: str,
    port: int,
    cstore,
    name: str,
    fn: Callable[[list[dict]], None],
    batch_size: int = 100,
    options: StreamClientOptions | None = None,
) -> int:
    """Consume a remote stream with a local cursor (the reference's
    rgrpc-consumer shape: StreamFunc + CursorStore + consumer → Run).

    At-least-once: the cursor commits only after ``fn(batch)`` returns.
    ErrHeadReached / ErrStopped propagate to the caller like run().
    Returns the last committed cursor.
    """
    from reflex_spark.streaming.run import ErrHeadReached, ErrStopped

    after = int(cstore.get_cursor(name) or 0)
    client = StreamClient(host, port, after=after, options=options)
    try:
        batch: list[dict] = []
        while True:
            try:
                batch.append(client.recv())
            except (ErrHeadReached, ErrStopped):
                if batch:
                    fn(batch)
                    cstore.set_cursor(name, batch[-1]["event_id"])
                raise
            if len(batch) >= batch_size:
                fn(batch)
                after = batch[-1]["event_id"]
                cstore.set_cursor(name, after)
                batch = []
    finally:
        client.close()
        cstore.flush()
