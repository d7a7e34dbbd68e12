"""EventLog: an append-only parquet event table with the canonical schema.

Reference parity (SURVEY.md §1.1-§1.2):
- Event shape {ID, Type, ForeignID, Timestamp, MetaData, Trace}
  (reference api.go:12-19) → fixed StructType below.
- EventsTable.Insert inserts exactly-one-event-per-state-change in the
  caller's txn (rsql/eventstable.go:226-246); here an append() call is the
  txn boundary — one parquet file set per append, ids assigned densely
  before the write becomes visible.
- Noop events are (foreign_id='0', type=0) (rsql/eventstable.go:497-505);
  `without_noops` filters them like the reference's noop filter
  (rsql/loader.go:64-94).

Scale posture: a single append() is a serialized id-assignment point, like
the reference's MySQL auto-increment. At 100 TB you shard the log (one
directory per shard, per-shard dense ids — exactly Kafka's partition model,
which the reference README cites as its inspiration) and Spark reads the
union; per-shard ordering is preserved, global ordering is (shard, id).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from reflex_spark.tables import empty_df
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("event_type", IntegerType(), False),
        StructField("foreign_id", StringType(), False),
        StructField("timestamp", TimestampType(), False),
        StructField("metadata", BinaryType(), True),
        StructField("trace", BinaryType(), True),
    ]
)

NOOP_FOREIGN_ID = "0"
NOOP_TYPE = 0


@dataclass(frozen=True)
class Gap:
    """A hole in the dense event-id sequence: ids in (prev, next) are
    absent (reference rsql/gapfill.go:15-24 — no gap iff prev+1 == next)."""

    prev: int
    next: int


def without_noops(df: DataFrame) -> DataFrame:
    """Drop noop/gap-filler events (reference rsql/loader.go:69-94)."""
    return df.where(
        ~((F.col("foreign_id") == NOOP_FOREIGN_ID) & (F.col("event_type") == NOOP_TYPE))
    )


def adapt_events(
    df: DataFrame,
    *,
    event_id: str,
    event_type: str,
    foreign_id: str,
    timestamp: str,
    metadata: str | None = None,
    trace: str | None = None,
    type_mapping: dict[str, int] | None = None,
) -> DataFrame:
    """Map an arbitrary physical events table to the canonical schema.

    Reference parity: the functional column-remapping options
    (WithEventIDField/WithEventTypeField/..., rsql/eventstable.go:67-118,
    defaults rsql/db.go:21-38) — point the engine at any existing table.
    ``type_mapping`` converts string type labels to the int enum (the
    reference's EventType is an int enum, api.go:45-49).
    """
    type_col = F.col(event_type)
    if type_mapping is not None:
        expr = F.lit(None).cast("int")
        for label, code in type_mapping.items():
            expr = F.when(type_col == label, code).otherwise(expr)
        type_col = expr
    return df.select(
        F.col(event_id).cast("long").alias("event_id"),
        type_col.cast("int").alias("event_type"),
        F.col(foreign_id).cast("string").alias("foreign_id"),
        F.col(timestamp).cast("timestamp").alias("timestamp"),
        (F.col(metadata) if metadata else F.lit(None)).cast("binary").alias("metadata"),
        (F.col(trace) if trace else F.lit(None)).cast("binary").alias("trace"),
    )


class EventLog:
    """Append-only event log at a directory path.

    With ``partitioned=True`` the log is laid out as
    ``event_date=YYYY-MM-DD/`` subdirectories (hive-style): time-bounded
    scans prune whole partitions at the file listing — the layout a 100 TB
    event log needs. Unpartitioned mode keeps single-directory simplicity
    for small logs and tests.
    """

    #: Refusal threshold for a single unsharded append: id assignment runs
    #: one global row_number window = one task, the deliberate
    #: auto-increment analogue. Tens of millions of rows through one task
    #: serializes the write; that's a sharding problem, not an append.
    DEFAULT_MAX_APPEND_ROWS = 10_000_000

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        partitioned: bool = False,
        max_append_rows: int | None = None,
        notifier=None,
    ):
        self.spark = spark
        self.path = path
        self.partitioned = partitioned
        self.max_append_rows = (
            max_append_rows if max_append_rows is not None else self.DEFAULT_MAX_APPEND_ROWS
        )
        #: Optional insert notifier (reference EventsNotifier,
        #: rsql/eventstable.go:554-571): append() fires it, the poll run
        #: loop parks on it at head instead of sleeping the backoff.
        self.notifier = notifier
        self._gap_listeners: list[Callable[[Gap], None]] = []
        #: In-instance head cache. Dense-id assignment already assumes a
        #: single writer per log (the auto-increment analogue); this
        #: instance's own appends are therefore the only head movements it
        #: can observe, so re-reading the ENTIRE log before every append
        #: just to recover max(event_id) is pure waste (it was the single
        #: largest cost in the 3-append streaming fixtures). First use
        #: reads storage; each append updates the cache.
        self._head_cache: int | None = None

    def _guard_append_size(self, n: int) -> None:
        if n > self.max_append_rows:
            raise ValueError(
                f"append of {n} rows exceeds max_append_rows="
                f"{self.max_append_rows}: a single append assigns ids through "
                "one global window task (the auto-increment analogue). Use "
                "ShardedEventLog for write scale-out (per-shard dense ids), "
                "or raise max_append_rows explicitly if you accept the "
                "single-task serialization."
            )

    # -- producer side ----------------------------------------------------

    def head(self) -> int:
        """Max assigned event_id, 0 if empty (reference rsql/db.go:112-120).

        Real read errors PROPAGATE: swallowing a transient storage failure
        here would restart id assignment at base=0 in append() and silently
        corrupt the dense-id invariant. Emptiness is handled structurally
        in read() (missing/empty directory → empty DataFrame), not by
        catching exceptions.

        Cached per instance after the first read (single-writer contract —
        see ``_head_cache``); a fresh EventLog handle always re-reads
        storage.
        """
        if self._head_cache is not None:
            return self._head_cache
        row = self.read().agg(F.max("event_id").alias("m")).collect()[0]
        self._head_cache = row["m"] if row["m"] is not None else 0
        return self._head_cache

    def append(self, events: DataFrame, order_by: list[str] | None = None) -> int:
        """Append events (no event_id column), assigning dense monotonic ids.

        Ids are `head + row_number ordered by (timestamp, foreign_id)` —
        dense and gap-free like MySQL auto_increment under the reference's
        gap-filling (rsql/gapfill.go); visibility is atomic at the parquet
        commit. Returns the new head id.

        ``order_by`` overrides the id-assignment sort for producers whose
        events carry an explicit intra-commit ordering (the CDC bridge
        orders update pre-images before post-images); extra ordering
        columns are dropped from the stored rows.
        """
        base = self.head()
        n = events.count()
        self._guard_append_size(n)
        pre_files = self._data_files()
        w = F.row_number().over(Window.orderBy(*(order_by or ["timestamp", "foreign_id"])))
        out = (
            events.withColumn("event_id", (F.lit(base) + w).cast("long"))
            .select([f.name for f in EVENT_SCHEMA.fields])
        )
        if self.partitioned:
            out.withColumn("event_date", F.col("timestamp").cast("date")).write.mode(
                "append"
            ).partitionBy("event_date").parquet(self.path)
        else:
            out.write.mode("append").parquet(self.path)
        self._stamp_commit_order(base + n, already=pre_files)
        self._head_cache = base + n
        if self.notifier is not None:
            self.notifier.notify()
        return base + n

    # Logical-mtime base for commit ordering (2001-09-09; any fixed epoch
    # works — FileStreamSource ages files relative to the NEWEST file in
    # the directory, not the wall clock, so a fixed base plus seconds-apart
    # offsets never trips maxFileAge).
    _MTIME_BASE = 1_000_000_000

    def _data_files(self) -> set[str]:
        """The log's current data-file paths (part-* only)."""
        import os

        out: set[str] = set()
        for root, _dirs, files in os.walk(self.path):
            for f in files:
                if f.startswith("part-"):
                    out.add(os.path.join(root, f))
        return out

    def _stamp_commit_order(self, seq: int, already: set[str]) -> None:
        """Stamp this commit's data files with logical mtime BASE+``seq``.

        Structured Streaming's file source processes files oldest-mtime
        first, so streaming consumers see appends in COMMIT order — the
        dense-id order append() just assigned — rather than in whatever
        order the filesystem clock happened to record.  ``seq`` is the new
        head id, strictly monotonic per log, so later commits always stamp
        later mtimes.  ``already`` is the exact file set captured BEFORE
        this commit's write: only files outside it are stamped — explicit
        tracking, same as streaming_judged._stamp_batch_order, rather than
        an mtime-threshold heuristic (which would re-stamp EARLIER commits
        once seq crossed the threshold and break commit ordering; large
        seq gaps could also trip FileStreamSource's maxFileAge relative to
        the newest stamp).  This replaces the defensive ``sleep(0.1)``
        every streaming caller used to need between appends (~2s of pure
        wall-clock per bench pass; SCALE_NOTES §28) and makes the ordering
        robust on coarse-mtime filesystems.
        """
        import os

        t = float(self._MTIME_BASE + seq)
        for p in self._data_files() - already:
            try:
                os.utime(p, (t, t))
            except OSError:
                # a concurrent reader/cleaner removed the file between
                # listing and stat; ordering of remaining files holds
                continue

    def insert(
        self,
        foreign_id: str,
        event_type: int,
        metadata: bytes | None = None,
        timestamp=None,
    ) -> int:
        """Insert one event (reference EventsTable.Insert,
        rsql/eventstable.go:226-246). Noop inserts are rejected like
        rsql/eventstable.go:231-233."""
        if foreign_id == NOOP_FOREIGN_ID and event_type == NOOP_TYPE:
            raise ValueError("noop event insert not allowed")
        from datetime import datetime, timezone

        ts = timestamp or datetime.now(timezone.utc).replace(tzinfo=None)
        df = self.spark.createDataFrame(
            [(event_type, foreign_id, ts, metadata, None)],
            StructType([f for f in EVENT_SCHEMA.fields if f.name != "event_id"]),
        )
        return self.append(df)

    # -- consumer side ----------------------------------------------------

    def read(self) -> DataFrame:
        """Batch scan of the full log (empty DataFrame before first append).
        Partitioned logs expose the extra ``event_date`` partition column —
        filter on it to prune partitions at the listing."""
        import os

        if not os.path.exists(self.path):
            return empty_df(self.spark, EVENT_SCHEMA)
        if self.partitioned:
            # Partition discovery needs >=1 data file; an existing but
            # file-less directory is an empty log, not an error.
            if not any(files for _, _, files in os.walk(self.path)):
                return empty_df(self.spark, EVENT_SCHEMA)
            return self.spark.read.parquet(self.path)
        return self.spark.read.schema(EVENT_SCHEMA).parquet(self.path)

    def read_after(
        self, after: int, limit: int | None = None, dense_only: bool = False
    ) -> DataFrame:
        """Ordered scan after a cursor (reference base loader SQL
        rsql/db.go:122-182: WHERE id > ? ORDER BY id ASC LIMIT n).
        The id predicate pushes down to the parquet scan.

        ``dense_only=True`` is the reference's gap detection
        (rsql/loader.go:96-134): return only the contiguous id prefix after
        the cursor. A reader that lists the directory while a multi-file
        append is mid-commit can observe id k+1 without id k; advancing the
        cursor past the hole would silently lose k. Truncating at the first
        gap blocks until the missing file lands — at-least-once preserved.
        The poll run loop enables this guard.
        """
        df = self.read().where(F.col("event_id") > after).orderBy("event_id")
        if limit:
            df = df.limit(limit)
        if dense_only:
            w = Window.orderBy("event_id")
            df = (
                df.withColumn("__rn", F.row_number().over(w))
                .where(F.col("event_id") == F.lit(after) + F.col("__rn"))
                .drop("__rn")
            )
        return df

    # -- gap filling (G2) --------------------------------------------------

    def listen_gaps(self, fn: Callable[[Gap], None]) -> None:
        """Register a gap listener (reference EventsTable.ListenGaps,
        rsql/eventstable.go:289-304). The poll run loop calls
        ``detect_gap``/``emit_gap`` when a dense read stalls; listeners
        (e.g. the noop filler from ``sources.gapfill.fill_gaps``) unblock
        the stream."""
        self._gap_listeners.append(fn)

    def emit_gap(self, gap: Gap) -> None:
        for fn in self._gap_listeners:
            fn(gap)

    def detect_gap(self, after: int) -> Gap | None:
        """Is the id right after ``after`` missing while later ids exist?

        One ids-only agg (column-pruned, predicate pushed): the poll loop
        calls this only when a dense read returns empty, so steady-state
        polling pays nothing. All mid-window holes eventually become
        holes-at-cursor (the loop consumes the dense prefix first), so
        checking at the cursor is complete."""
        row = (
            self.read()
            .where(F.col("event_id") > after)
            .agg(F.min("event_id").alias("m"))
            .collect()[0]
        )
        if row["m"] is not None and row["m"] > after + 1:
            return Gap(prev=after, next=row["m"])
        return None

    def missing_ids(self, gap: Gap) -> list[int]:
        """Ids in (prev, next) not yet committed (a writer may land files
        during the filler's grace wait)."""
        present = {
            r["event_id"]
            for r in self.read()
            .where((F.col("event_id") > gap.prev) & (F.col("event_id") < gap.next))
            .select("event_id")
            .collect()
        }
        return [i for i in range(gap.prev + 1, gap.next) if i not in present]

    def fill_noops(self, ids: list[int]) -> int:
        """Insert noop events at exactly these ids (reference fillGap,
        rsql/gapfill.go:70-95: noop = foreign_id '0', type 0). Re-checks
        committed ids immediately before the write, so a racing writer's
        rows are kept (the file-log analogue of the reference tolerating
        the duplicate-key error when someone got there first). Returns the
        number of noops written."""
        if not ids:
            return 0
        still_missing = self.missing_ids(Gap(prev=min(ids) - 1, next=max(ids) + 1))
        fill = sorted(set(ids) & set(still_missing))
        if not fill:
            return 0
        from datetime import datetime, timezone

        ts = datetime.now(timezone.utc).replace(tzinfo=None)
        df = self.spark.createDataFrame(
            [(i, NOOP_TYPE, NOOP_FOREIGN_ID, ts, None, None) for i in fill],
            EVENT_SCHEMA,
        )
        if self.partitioned:
            df.withColumn("event_date", F.col("timestamp").cast("date")).write.mode(
                "append"
            ).partitionBy("event_date").parquet(self.path)
        else:
            df.write.mode("append").parquet(self.path)
        # gaps sit below head by construction, but stay defensive: a fill
        # at/above a stale cached head must never corrupt id assignment
        self._head_cache = None
        if self.notifier is not None:
            self.notifier.notify()
        return len(fill)

    def compact(self, target_partitions: int | None = None) -> None:
        """Rewrite the log into ``target_partitions`` files (default: one
        per ~128MB). Every append creates a file set; at high append rates
        the small-files problem dominates scan cost, so periodic compaction
        is part of operating a file-backed log (Delta/Iceberg do this as
        OPTIMIZE).

        Swap protocol: the rewrite is staged into a versioned sibling data
        directory and committed by atomically replacing a symlink at
        ``self.path`` — concurrent head()/read() always resolve a complete
        log, never an absent or partial one. The FIRST compaction converts
        a plain directory to the symlink layout and has a sub-millisecond
        non-atomic window (rename away + symlink in); quiesce readers
        around that one conversion, or use ManifestEventLog, whose CURRENT
        pointer is atomic from the start.

        Compaction must NOT run while checkpointed *streaming* readers
        (read_stream) are attached: they track processed files, so the
        rewritten files would be re-ingested wholesale as duplicates. Poll
        consumers (run()) are safe — their cursor is an event id and
        compaction preserves ids.
        """
        import os
        import shutil

        df = self.read()
        head = self.head()  # stamp target for the rewrite (see below)
        if target_partitions is None:
            total_bytes = sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(self.path)
                for f in files
            )
            target_partitions = max(1, total_bytes // (128 << 20))
        base = self.path.rstrip("/")
        new_data = f"{base}.data.{int(time.time() * 1e6):x}"
        writer = df.coalesce(int(target_partitions)).write.mode("overwrite")
        if self.partitioned:
            writer = writer.partitionBy("event_date")
        writer.parquet(new_data)
        # Stamp the rewrite into the LOGICAL mtime domain at the head it
        # captured: parquet writes carry real-clock mtimes (~1.7e9), which
        # sort AFTER every logical stamp (BASE + seq ≈ 1.0e9) — a stream
        # started after compact+append would replay the newer appends
        # BEFORE the compacted history, breaking the file-order==id-order
        # contract run_stream's max-id-watermark consumers rely on. With
        # BASE + head, appends after compaction (BASE + head + n) keep
        # sorting strictly after the compacted files.
        t = float(self._MTIME_BASE + head)
        for root, _dirs, files in os.walk(new_data):
            for f in files:
                if f.startswith("part-"):
                    try:
                        os.utime(os.path.join(root, f), (t, t))
                    except OSError:
                        pass
        if os.path.islink(base):
            old_target = os.path.realpath(base)
            tmp_link = base + ".lnk"
            if os.path.lexists(tmp_link):
                os.remove(tmp_link)
            os.symlink(new_data, tmp_link)
            os.replace(tmp_link, base)  # atomic: symlink replaces symlink
            shutil.rmtree(old_target, ignore_errors=True)
        else:
            # one-time conversion to the symlink layout (tiny window)
            old = base + ".old"
            os.rename(base, old)
            os.symlink(new_data, base)
            shutil.rmtree(old)
        # ids are preserved, so the cached head is numerically still right —
        # but stay defensive: a compact() racing an external state change
        # must never leave a stale cache behind (ADVICE r12).
        self.invalidate_head_cache()

    def invalidate_head_cache(self) -> None:
        """Force the next head() to re-read storage.

        The in-instance head cache assumes this handle's own appends are
        the only head movements (single-writer contract). Callers that
        write to ``self.path`` OUT OF BAND — raw parquet writes into the
        log directory (crash-injection fixtures do this), a second handle
        on the same log, restore-from-backup — must call this before the
        next append, or dense-id assignment would reuse ids."""
        self._head_cache = None

    def read_stream(self, max_files_per_trigger: int | None = None) -> DataFrame:
        """Structured Streaming source over the log (reference
        EventsTable.Stream, rsql/eventstable.go:259-287). The checkpoint's
        file ledger is the cursor; maxFilesPerTrigger ≈ WithEventLookupLimit."""
        reader = self.spark.readStream.schema(EVENT_SCHEMA)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.parquet(self.path)
