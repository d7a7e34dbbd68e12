"""Streaming core: consumers, run loops, cursor stores, consumer patterns.

Two execution paths with identical operator semantics:

- ``poll``   — an incremental poll loop mirroring the reference's Run
  (run.go:16-105) exactly: GetCursor → load batch after cursor → consume →
  SetCursor. Gives per-batch ack/dead-letter/best-effort semantics.
- ``stream`` — Structured Streaming (readStream → foreachBatch +
  checkpoint); the checkpoint is the cursor (SURVEY.md §1.1).
"""

from reflex_spark.streaming.consumer import Consumer, ConsumerError, FilterError
from reflex_spark.streaming.cursors import (
    BufferedCursorStore,
    CursorStore,
    FileCursorStore,
    MemCursorStore,
    ReadThroughCursorStore,
)
from reflex_spark.streaming.notify import InMemNotifier, StubNotifier
from reflex_spark.streaming.run import (
    ErrHeadReached,
    ErrStopped,
    Spec,
    StreamOptions,
    is_expected,
    is_filter_err,
    is_head_reached_err,
    is_stopped_err,
    run,
    run_forever,
)

__all__ = [
    "Consumer",
    "ConsumerError",
    "FilterError",
    "BufferedCursorStore",
    "CursorStore",
    "FileCursorStore",
    "MemCursorStore",
    "ReadThroughCursorStore",
    "InMemNotifier",
    "StubNotifier",
    "ErrHeadReached",
    "ErrStopped",
    "is_expected",
    "is_filter_err",
    "is_head_reached_err",
    "is_stopped_err",
    "Spec",
    "StreamOptions",
    "run",
    "run_forever",
]
