"""ManifestEventLog: atomic appends via a commit manifest.

A plain parquet directory exposes files as they are renamed in, one by one
— a reader listing mid-append can observe half a batch (the race the poll
loop's gap guard defends against). A manifest log removes the race, the
way Delta/Iceberg's transaction logs do, with two invariants:

1. Data files live under ``batches/<seq>/`` and are never listed directly;
   a batch becomes visible only when its manifest entry
   ``manifest/<seq>.json`` appears — a single atomic rename that happens
   strictly after every data file is fully written.
2. Manifest entries carry the id range, so ``head()`` is O(1) file reads
   (no data scan) — on an object store this is the difference between a
   metadata GET and a full-table LIST+scan per append.

Single-writer per log, like EventLog's dense-id assignment; shard with
ShardedEventLog for write scale-out (it accepts any EventLog-shaped ctor).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from reflex_spark.sources.event_log import EVENT_SCHEMA, EventLog


class ManifestEventLog(EventLog):
    def __init__(self, spark: SparkSession, path: str):
        super().__init__(spark, path)
        self._manifest_dir = os.path.join(path, "manifest")
        self._batches_dir = os.path.join(path, "batches")

    # -- manifest bookkeeping ---------------------------------------------

    def _entries(self) -> list[dict]:
        if not os.path.isdir(self._manifest_dir):
            return []
        out = []
        for name in sorted(os.listdir(self._manifest_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self._manifest_dir, name)) as f:
                    out.append(json.load(f))
        return out

    def head(self) -> int:
        entries = self._entries()
        return entries[-1]["max_id"] if entries else 0

    # -- producer ----------------------------------------------------------

    def append(self, events: DataFrame) -> int:
        base = self.head()
        seq = len(self._entries())
        batch_dir = os.path.join(self._batches_dir, f"{seq:08d}")
        w = F.row_number().over(Window.orderBy("timestamp", "foreign_id"))
        out = events.withColumn("event_id", (F.lit(base) + w).cast("long")).select(
            [f.name for f in EVENT_SCHEMA.fields]
        )
        out.write.mode("overwrite").parquet(batch_dir)  # fully written first
        n = self.spark.read.parquet(batch_dir).count()
        entry = {"seq": seq, "dir": batch_dir, "min_id": base + 1, "max_id": base + n}
        os.makedirs(self._manifest_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self._manifest_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(entry, f)
        # the commit point: one atomic rename makes the whole batch visible
        os.replace(tmp, os.path.join(self._manifest_dir, f"{seq:08d}.json"))
        return base + n

    # -- consumer ----------------------------------------------------------

    def read(self) -> DataFrame:
        entries = self._entries()
        if not entries:
            return self.spark.createDataFrame([], EVENT_SCHEMA)
        return self.spark.read.schema(EVENT_SCHEMA).parquet(*[e["dir"] for e in entries])

    def read_stream(self, max_files_per_trigger: int | None = None) -> DataFrame:
        """Streaming over the batches tree. The file source's per-file
        ledger tolerates mid-append discovery (no loss, only deferral), so
        streaming does not need the manifest."""
        reader = self.spark.readStream.schema(EVENT_SCHEMA)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.option("pathGlobFilter", "*.parquet").parquet(
            os.path.join(self._batches_dir, "*")
        )

    def compact(self, target_partitions: int | None = None) -> None:
        """Rewrite every committed batch into one, then swap the manifest
        to a single entry — readers see either the old set or the new one."""
        entries = self._entries()
        if not entries:
            return
        head = self.head()
        df = self.read()
        # unique dir per compaction: never clobber a dir the live manifest
        # might still reference (e.g. the previous compaction's output)
        new_dir = os.path.join(self._batches_dir, f"compact-{os.urandom(6).hex()}")
        df.coalesce(int(target_partitions or 1)).write.mode("overwrite").parquet(new_dir)
        new_manifest = os.path.join(self.path, "manifest.new")
        os.makedirs(new_manifest, exist_ok=True)
        with open(os.path.join(new_manifest, f"{0:08d}.json"), "w") as f:
            json.dump({"seq": 0, "dir": new_dir, "min_id": 1, "max_id": head}, f)
        old = self._manifest_dir + ".old"
        os.rename(self._manifest_dir, old)
        os.rename(new_manifest, self._manifest_dir)
        import shutil

        shutil.rmtree(old)
        # drop the now-unreferenced batch dirs so directory-based streaming
        # readers don't pick up stale files
        for e in entries:
            shutil.rmtree(e["dir"], ignore_errors=True)
