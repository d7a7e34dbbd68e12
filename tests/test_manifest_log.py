"""ManifestEventLog: atomic visibility, O(1) head, consume-loop compat."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from reflex_spark.sources.manifest_log import ManifestEventLog
from reflex_spark.sources.memory import make_events
from reflex_spark.streaming import Consumer, ErrHeadReached, MemCursorStore, Spec, StreamOptions, run
from reflex_spark.testkit import check_consume_contract, check_event_log


def test_manifest_log_append_read_head(spark, tmp_path):
    log = ManifestEventLog(spark, str(tmp_path / "mlog"))
    assert log.head() == 0 and log.read().count() == 0
    log.append(make_events(spark, [(1, "a"), (1, "b")]))
    log.append(make_events(spark, [(2, "c")]))
    assert log.head() == 3  # O(1): straight from the manifest
    ids = [r["event_id"] for r in log.read().orderBy("event_id").collect()]
    assert ids == [1, 2, 3]


def test_manifest_commit_is_the_visibility_point(spark, tmp_path):
    """Data files without a manifest entry are invisible; the manifest
    rename is the commit."""
    log = ManifestEventLog(spark, str(tmp_path / "mlog"))
    log.append(make_events(spark, [(1, "a")]))

    # simulate a writer that crashed after data files, before the commit
    orphan = str(tmp_path / "mlog" / "batches" / "00000099")
    make_events(spark, [(9, "ghost")]).withColumn(
        "event_id", F.lit(99).cast("long")
    ).select("event_id", "event_type", "foreign_id", "timestamp", "metadata", "trace").write.parquet(orphan)

    assert log.head() == 1
    assert log.read().count() == 1  # orphan batch invisible

    # the commit lands → batch visible atomically
    entry = {"seq": 99, "dir": orphan, "min_id": 99, "max_id": 99}
    with open(str(tmp_path / "mlog" / "manifest" / "00000099.json"), "w") as f:
        json.dump(entry, f)
    assert log.head() == 99
    assert log.read().count() == 2


def test_manifest_log_conformance_and_consume(spark, tmp_path):
    log = ManifestEventLog(spark, str(tmp_path / "mlog"))
    check_event_log(log)
    check_consume_contract(log, MemCursorStore())


def test_manifest_log_compact_preserves_and_cleans(spark, tmp_path):
    log = ManifestEventLog(spark, str(tmp_path / "mlog"))
    for i in range(4):
        log.append(make_events(spark, [(1, f"u{i}")]))
    before = [(r["event_id"], r["foreign_id"]) for r in log.read().orderBy("event_id").collect()]
    log.compact()
    after = [(r["event_id"], r["foreign_id"]) for r in log.read().orderBy("event_id").collect()]
    assert after == before
    assert log.head() == 4
    batch_dirs = os.listdir(str(tmp_path / "mlog" / "batches"))
    assert len(batch_dirs) == 1  # stale dirs removed
    # still appendable, ids continue densely
    log.append(make_events(spark, [(2, "post")]))
    assert log.head() == 5
    seen = []
    spec = Spec(log, MemCursorStore(), Consumer("m", lambda df, meta: seen.extend(
        r["event_id"] for r in df.select("event_id").collect())), StreamOptions(to_head=True))
    with pytest.raises(ErrHeadReached):
        run(spec)
    assert seen == [1, 2, 3, 4, 5]


def test_manifest_compact_current_pointer_atomic(spark, tmp_path):
    """Compaction commits via the CURRENT pointer: at every step the
    manifest resolves to a complete generation (head() never sees 0), and
    repeated compactions bump generations and keep appends working."""
    import os

    from reflex_spark.sources.memory import make_events

    log = ManifestEventLog(spark, str(tmp_path / "mlog"))
    log.append(make_events(spark, [(1, "a"), (1, "b")]))
    log.append(make_events(spark, [(2, "c")]))
    assert log.head() == 3

    log.compact()
    assert os.path.exists(str(tmp_path / "mlog" / "CURRENT"))
    assert log.head() == 3
    assert log.read().count() == 3

    # appends continue against the new generation with dense ids
    log.append(make_events(spark, [(3, "d")]))
    assert log.head() == 4

    # second compaction: generation bumps again, old generation cleaned
    log.compact()
    assert log.head() == 4
    assert log.read().count() == 4
    gens = [d for d in os.listdir(str(tmp_path / "mlog")) if d.startswith("manifest")]
    assert gens == ["manifest-2"]
