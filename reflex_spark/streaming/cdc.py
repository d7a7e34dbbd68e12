"""CDC bridge: TxTable commits → EventLog events.

The reference's whole design is "tables emit events, consumers react"
(README "Characteristics"; the MySQL-binlog-shaped event tables of
rsql/db.go). TxTable supplies the transactional table; this module turns
its change data feed into canonical events a reflex-style consumer loop
can poll — insert/delete types, the row key as ``foreign_id``, the full
row JSON in ``metadata``. The pair (``TxTable.changes`` +
``publish_changes``) is the Spark-idiomatic equivalent of tailing the
binlog.

Idempotence contract: one ``publish_changes(from_v, to_v)`` call per
version window — the log has no dedup, so republishing a window appends
duplicate events (same at-least-once posture as the reference's event
insertion; consumers are expected to be idempotent, README "at-least-
once").
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from reflex_spark.sources.event_log import EventLog
from reflex_spark.sources.tx_table import TxTable

CDC_INSERT_TYPE = 1
CDC_DELETE_TYPE = 2


def publish_changes(
    table: TxTable,
    log: EventLog,
    key_col: str,
    from_version: int,
    to_version: int | None = None,
    at: datetime | None = None,
) -> int:
    """Append the table's change feed for (from_version, to_version] to
    the event log. ``at`` stamps every emitted event (pass a deterministic
    value in tests; defaults to now). Returns the new log head.

    Events: ``event_type`` CDC_INSERT_TYPE/CDC_DELETE_TYPE,
    ``foreign_id`` = the row key as string, ``metadata`` = the full row
    as JSON bytes (pre-image for deletes, post-image for inserts — an
    UPDATE therefore emits both, delete-then-insert by event-id order
    within the same key).
    """
    ch = table.changes(from_version, to_version).localCheckpoint()
    data_cols = [c for c in ch.columns if c != "_change_type"]
    ts = F.lit(at if at is not None else datetime.now()).cast("timestamp")

    def _events(subset, etype: int):
        return subset.select(
            F.lit(etype).cast("int").alias("event_type"),
            F.col(key_col).cast("string").alias("foreign_id"),
            ts.alias("timestamp"),
            F.to_json(F.struct(*data_cols)).cast("binary").alias("metadata"),
            F.lit(None).cast("binary").alias("trace"),
        )

    # Two commits, deletes first: EventLog.append re-sorts by (timestamp,
    # foreign_id) when assigning dense ids, so a same-key delete+insert
    # pair (an UPDATE) would tie nondeterministically inside one commit.
    # Splitting guarantees every pre-image id < every post-image id.
    head = log.head()
    deletes = _events(ch.where(F.col("_change_type") == "delete"), CDC_DELETE_TYPE)
    if not deletes.isEmpty():
        head = log.append(deletes)
    inserts = _events(ch.where(F.col("_change_type") == "insert"), CDC_INSERT_TYPE)
    if not inserts.isEmpty():
        head = log.append(inserts)
    return head
