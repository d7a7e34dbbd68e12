"""Trace propagation: carry tracing context through the event log.

Reference parity (T1, internal/tracing/*): the reference marshals an
OpenTelemetry span context (trace_id, span_id) into the event's `trace`
bytes on insert (rsql/db.go:64-73) and restores it into the consumer's
context on consume (consumer.go:163-168). OTel libs aren't available in
this container, so the wire format is a minimal deterministic encoding of
the same pair; the Spark-side plumbing (binary column pass-through +
encode/decode at the boundaries) is the real, tested surface.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_FMT = "!16s8s"  # 128-bit trace id, 64-bit span id (OTel sizes)


@dataclass(frozen=True)
class SpanContext:
    trace_id: bytes  # 16 bytes
    span_id: bytes  # 8 bytes


def marshal(ctx: SpanContext) -> bytes:
    """Encode a span context for the event `trace` column
    (reference tracing.Marshal, internal/tracing/encode.go:12-19)."""
    return struct.pack(_FMT, ctx.trace_id, ctx.span_id)


def unmarshal(raw: bytes | None) -> SpanContext | None:
    """Decode the `trace` column (reference tracing.Unmarshal,
    internal/tracing/decode.go:11-32); None/garbage → None (the reference
    ignores undecodable traces rather than failing the consumer)."""
    if raw is None or len(raw) != struct.calcsize(_FMT):
        return None
    trace_id, span_id = struct.unpack(_FMT, raw)
    return SpanContext(trace_id, span_id)


def trace_id_hex(trace: Column | str) -> Column:
    """Column form: hex trace id from the binary trace column (for joins/
    grouping on trace without leaving the JVM)."""
    c = F.col(trace) if isinstance(trace, str) else trace
    return F.lower(F.hex(F.substring(c, 1, 16)))
