"""Poll→push adapter: expose a pagination API as an event stream.

Reference parity (rpatterns/poll.go:12-106): `NewPoller(pollFunc)` turns a
cursor-paginated API (`poll(cursor) -> (items, next_cursor)`) into a
StreamFunc with backoff between polls. Here each poll materializes a batch
DataFrame appended to an EventLog, from which every consumer pattern (run,
shards, dead-letter, streaming) composes — one ingestion point instead of a
bespoke per-consumer client.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from reflex_spark.sources.event_log import EventLog

# poll(cursor) -> (rows, next_cursor); rows == [] means "at head".
PollFunc = Callable[[str], tuple[list[tuple], str]]


class Poller:
    """Drains a pagination API into an EventLog."""

    def __init__(
        self,
        spark: SparkSession,
        poll_fn: PollFunc,
        log: EventLog,
        row_schema,
        backoff: float = 0.2,  # reference default backoff, scaled for tests
        cstore=None,  # optional CursorStore: persists the page cursor
        name: str = "poller",
    ):
        self.spark = spark
        self.poll_fn = poll_fn
        self.log = log
        self.row_schema = row_schema
        self.backoff = backoff
        self._cstore = cstore
        self._name = name
        restored = cstore.get_cursor(name) if cstore else 0
        # string page cursors (the reference's rblob-style composite
        # cursors, WithCursorStrings): unset stores return int 0
        self.cursor = restored if isinstance(restored, str) else ""

    def poll_once(self) -> int:
        """One poll: append the page (if any) to the log, then persist the
        page cursor — a restart resumes from the last committed page."""
        rows, self.cursor = self.poll_fn(self.cursor)
        if not rows:
            return 0
        df: DataFrame = self.spark.createDataFrame(rows, self.row_schema)
        self.log.append(df)
        if self._cstore is not None and self.cursor:
            self._cstore.set_cursor(self._name, self.cursor)
        return len(rows)

    def drain(self, max_polls: int = 1000) -> int:
        """Poll until the API reports head (empty page). Returns total rows."""
        total = 0
        for _ in range(max_polls):
            n = self.poll_once()
            if n == 0:
                return total
            total += n
            time.sleep(0)  # yield; real deployments sleep(self.backoff) at head
        return total
