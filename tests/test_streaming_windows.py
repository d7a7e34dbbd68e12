"""Streaming windowed operators: watermarks, sessions, dedup, custom state.

Pattern: write a temp event log, run each streaming transform with
AvailableNow into a memory sink, assert the aggregate contents.
"""

from __future__ import annotations

from datetime import timedelta

import pytest

from reflex_spark.sources.memory import EPOCH, make_events, seed_log
from reflex_spark.streaming.windows import (
    dedup_within_watermark,
    running_count_per_key,
    session_counts,
    sliding_counts,
    tumbling_counts,
)


def run_to_memory(df, name: str, output_mode: str, spark):
    # complete mode for window aggs: append only emits watermark-closed
    # windows, which an AvailableNow drain never reaches for the tail.
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_counts_stream(spark, tmp_path):
    # 10 events at 20-minute spacing: hours 0,1,2 get 3/3/3+1 events
    log = seed_log(
        spark, str(tmp_path / "log"), [(1, "k")] * 10, step_seconds=1200
    )
    out = run_to_memory(
        tumbling_counts(log.read_stream(), "1 hour"), "tumbling_t", "complete", spark
    )
    rows = {r["window_start"].minute: r["n_events"] for r in out.collect()}
    got = sorted(r["n_events"] for r in out.collect())
    assert sum(got) == 10
    assert got == [1, 3, 3, 3]


def test_sliding_counts_stream(spark, tmp_path):
    log = seed_log(spark, str(tmp_path / "log"), [(1, "k")] * 4, step_seconds=1800)
    out = run_to_memory(
        sliding_counts(log.read_stream(), "2 hours", "1 hour"), "sliding_t", "complete", spark
    )
    # each event belongs to 2 windows
    assert sum(r["n_events"] for r in out.collect()) == 8


def test_session_counts_stream(spark, tmp_path):
    # two sessions for key "a" (gap > 30min), one for "b"
    a1 = make_events(spark, [(1, "a"), (1, "a")], start=EPOCH, step_seconds=60)
    a2 = make_events(spark, [(1, "a")], start=EPOCH + timedelta(hours=2))
    b = make_events(spark, [(1, "b")], start=EPOCH + timedelta(minutes=5))
    log = seed_log(spark, str(tmp_path / "log"), [])
    for df in (a1, a2, b):
        log.append(df)
    out = run_to_memory(
        session_counts(log.read_stream(), gap="30 minutes"), "session_t", "complete", spark
    )
    sessions = sorted((r["foreign_id"], r["n_events"]) for r in out.collect())
    assert sessions == [("a", 1), ("a", 2), ("b", 1)]


def test_dedup_within_watermark_stream(spark, tmp_path):
    log = seed_log(
        spark,
        str(tmp_path / "log"),
        [(1, "x"), (1, "x"), (2, "x"), (1, "y")],
        step_seconds=60,
    )
    out = run_to_memory(
        dedup_within_watermark(log.read_stream(), ["event_type", "foreign_id"]),
        "dedup_t",
        "append",
        spark,
    )
    keys = sorted((r["event_type"], r["foreign_id"]) for r in out.collect())
    assert keys == [(1, "x"), (1, "y"), (2, "x")]


def test_running_count_per_key_state(spark, tmp_path):
    log = seed_log(
        spark, str(tmp_path / "log"), [(1, "a"), (1, "b"), (1, "a"), (1, "a")]
    )
    out = run_to_memory(
        running_count_per_key(log.read_stream(), key_col="foreign_id"),
        "state_t",
        "update",
        spark,
    )
    counts = {r["foreign_id"]: r["n_events"] for r in out.collect()}
    assert counts == {"a": 3, "b": 1}


def test_stream_stream_join(spark, tmp_path):
    """Watermarked interval join between two event streams on foreign_id."""
    from reflex_spark.streaming.windows import stream_stream_join

    left = seed_log(spark, str(tmp_path / "left"), [(1, "u1"), (1, "u2")], step_seconds=60)
    right_rows = make_events(
        spark, [(2, "u1"), (2, "u3")], start=EPOCH + timedelta(minutes=10), step_seconds=60
    )
    right = seed_log(spark, str(tmp_path / "right"), [])
    right.append(right_rows)

    joined = stream_stream_join(
        left.read_stream(), right.read_stream(), key="foreign_id", within="1 hour"
    )
    out = run_to_memory(joined, "ssj_t", "append", spark)
    rows = [(r["l_key"], r["l_event_type"], r["r_event_type"]) for r in out.collect()]
    assert rows == [("u1", 1, 2)]  # only u1 has a right event within the hour


def test_stream_static_dimension_join(spark, tmp_path):
    """Stream-static join: streaming events enriched against a static
    dimension (broadcast per microbatch — no streaming state needed)."""
    from pyspark.sql import functions as F

    log = seed_log(spark, str(tmp_path / "log"), [(1, "u1"), (2, "u2"), (1, "u3")])
    dim = spark.createDataFrame(
        [("u1", "gold"), ("u2", "silver")], ["foreign_id", "tier"]
    )
    enriched = log.read_stream().join(F.broadcast(dim), "foreign_id", "left")
    out = run_to_memory(enriched, "ssd_t", "append", spark)
    rows = {r["foreign_id"]: r["tier"] for r in out.collect()}
    assert rows == {"u1": "gold", "u2": "silver", "u3": None}


@pytest.mark.slow  # multi-minute-class probe; default run excluded (r17 verify budget), runs under -m slow
def test_watermark_late_drop_rule(spark, tmp_path):
    """Pin the EMPIRICAL late-drop semantics the stream_watermark_rollup
    oracle replays (measured on pyspark 4.1.2, availableNow + per-file
    micro-batches, update mode):

    - the filter for batch k uses the watermark computed from event time
      seen through batch k-2 (the reported watermark lags one batch);
    - a row is dropped iff its window END <= that cutoff — equality DROPS.

    Three single-file batches; delay 30m; hourly windows. Batch 0's max ts
    is 11:30, so the batch-2 cutoff is exactly 11:00: the 10:20 straggler
    (window end 11:00) must drop on the boundary, 11:10 (window end 12:00)
    must survive, and batch 1's straggler must NOT drop (its cutoff comes
    from batch -1 = none).
    """
    import time as _time

    from pyspark.sql import functions as F

    def mk(ts_list):
        return spark.createDataFrame([(t,) for t in ts_list], "ts string").select(
            F.col("ts").cast("timestamp").alias("ts")
        )

    src = str(tmp_path / "in")
    mk(["2020-01-01 10:15:00", "2020-01-01 11:30:00"]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _time.sleep(0.2)
    # batch 1: straggler 10:20 — filter cutoff for batch 1 is from batch
    # -1 (none) → kept even though the reported watermark is already 11:00
    mk(["2020-01-01 10:20:00", "2020-01-01 11:45:00"]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _time.sleep(0.2)
    # batch 2: cutoff = max ts of batch 0 (11:30) - 30m = 11:00 exactly
    mk(["2020-01-01 10:20:00", "2020-01-01 11:10:00"]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    updates = []

    def handle(bdf, bid):
        updates.append(
            (bid, sorted((str(r["window"]["start"]), r["cnt"]) for r in bdf.collect()))
        )

    stream = spark.readStream.schema("ts timestamp").option("maxFilesPerTrigger", 1).parquet(src)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    by_batch = dict(updates)
    # batch 1: straggler accepted (win 10:00 → 2), 11:45 lands in win 11:00
    assert ("2020-01-01 10:00:00", 2) in by_batch[1]
    # batch 2: 10:20 dropped ON the boundary (no win-10 update), 11:10 kept
    assert by_batch[2] == [("2020-01-01 11:00:00", 3)]


@pytest.mark.slow  # multi-minute-class probe; default run excluded (r17 verify budget), runs under -m slow
def test_watermark_invariants_from_progress(spark, tmp_path):
    """Pin the watermark CONTRACT from the engine's own
    StreamingQueryProgress rather than the measured k-2 batch-lag rule
    (VERDICT r4 #2). Five single-file micro-batches with stragglers placed
    to both drop and survive across several batches; after the run, every
    per-batch per-window outcome is characterized exactly:

      a row of batch k is kept iff its window END > wm_used(k),

    where wm_used(k) = the watermark REPORTED by the progress entry of
    batch k-1 (Spark reports in progress[k] the watermark derived from
    data through batch k-1, one batch ahead of the filter — this
    identification is itself asserted here: if a Spark upgrade shifts
    when watermarks apply, this test fails loudly and the
    stream_watermark_rollup oracle must be re-measured).

    Two version-robust invariants are asserted on top, free of any
    report-lag assumption:
      (1) zero on-time loss — every row whose window end exceeds the
          final (max) reported watermark appears in the result;
      (2) every dropped row is provably behind the final watermark.
    """
    import time as _time
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    def mk(ts_list):
        return spark.createDataFrame([(t,) for t in ts_list], "ts string").select(
            F.col("ts").cast("timestamp").alias("ts")
        )

    batches = [
        ["2020-01-01 10:15:00", "2020-01-01 11:30:00"],
        ["2020-01-01 10:20:00", "2020-01-01 11:45:00"],   # straggler kept (no wm yet)
        ["2020-01-01 10:20:00", "2020-01-01 11:10:00", "2020-01-01 12:40:00"],
        ["2020-01-01 10:30:00", "2020-01-01 11:20:00", "2020-01-01 13:10:00"],
        ["2020-01-01 11:05:00", "2020-01-01 12:30:00", "2020-01-01 13:20:00"],
    ]
    src = str(tmp_path / "in")
    for rows in batches:
        mk(rows).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(0.2)  # strictly-ordered mtimes -> batch order = list order

    updates: list[tuple[int, dict]] = []

    def handle(bdf, bid):
        updates.append(
            (bid, {str(r["window"]["start"]): r["cnt"] for r in bdf.collect()})
        )

    stream = (
        spark.readStream.schema("ts timestamp").option("maxFilesPerTrigger", 1).parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive

    def parse_wm(p):
        wm = (p.get("eventTime") or {}).get("watermark")
        if not wm or wm.startswith("1970"):
            return None
        return datetime.strptime(wm.replace("Z", ""), "%Y-%m-%dT%H:%M:%S.%f")

    progress_wm = {p["batchId"]: parse_wm(p) for p in q.recentProgress}
    # availableNow may run a trailing no-input batch (watermark commit);
    # the file->batch mapping covers only batches that consumed input
    data_batches = sorted(
        p["batchId"] for p in q.recentProgress if p.get("numInputRows", 0) > 0
    )
    assert len(data_batches) == len(batches)
    for bid, emitted in updates:
        if bid not in data_batches:
            assert emitted == {}, f"no-input batch {bid} emitted {emitted}"

    def hour(ts: str) -> datetime:
        d = datetime.strptime(ts, "%Y-%m-%d %H:%M:%S")
        return d.replace(minute=0, second=0)

    # replay per-batch per-window outcomes from the cumulative update-mode
    # emissions: kept rows in (batch, window) = count delta
    cum: dict[str, int] = {}
    kept_rows: list[datetime] = []
    by_batch = dict(updates)
    for i, bid in enumerate(data_batches):
        wm_used = progress_wm.get(data_batches[i - 1]) if i > 0 else None
        in_rows: dict[str, int] = {}
        for ts in batches[i]:
            w = str(hour(ts))
            in_rows[w] = in_rows.get(w, 0) + 1
        emitted = by_batch[bid]
        for w, n_in in in_rows.items():
            delta = emitted.get(w, cum.get(w, 0)) - cum.get(w, 0)
            win_end = datetime.strptime(w, "%Y-%m-%d %H:%M:%S") + timedelta(hours=1)
            if wm_used is None or win_end > wm_used:
                assert delta == n_in, (
                    f"batch {bid} window {w}: on-time/kept rows lost "
                    f"(wm_used={wm_used}, delta={delta}, in={n_in})"
                )
                kept_rows.extend([win_end] * n_in)
            else:
                assert delta == 0, (
                    f"batch {bid} window {w}: row behind watermark was kept "
                    f"(wm_used={wm_used}, delta={delta})"
                )
        for w, c in emitted.items():
            cum[w] = c

    # sanity: the fixture exercises both paths across multiple batches
    n_total = sum(len(b) for b in batches)
    n_kept = sum(cum.values())
    assert 0 < n_total - n_kept < n_total

    # version-robust invariants (no report-lag assumption):
    final_wm = max(w for w in progress_wm.values() if w is not None)
    for i, rows in enumerate(batches):
        for ts in rows:
            win_end = hour(ts) + timedelta(hours=1)
            if win_end > final_wm:
                # (1) on-time rows (never behind any reported watermark)
                # must be present in the final counts
                w = str(hour(ts))
                assert cum.get(w, 0) >= 1, f"on-time window {w} lost"
    dropped = n_total - n_kept
    # (2) every dropped row provably behind the final watermark: recount
    # drops among rows whose window end <= final_wm only
    droppable = sum(
        1 for rows in batches for ts in rows if hour(ts) + timedelta(hours=1) <= final_wm
    )
    assert dropped <= droppable


def test_stream_watermark_rollup_drops_stragglers(spark):
    """The judged watermark query must actually exercise the drop path:
    some of the held-back every-23rd events fall behind the watermark and
    are dropped, others survive — never all or none."""
    from pyspark.sql import functions as F

    from reflex_spark.queries import all_queries
    from reflex_spark.tables import load_tables

    sf = "/root/testdata/sf0.001"
    total = load_tables(spark, sf)["events"].count()
    late_pool = load_tables(spark, sf)["events"].where(F.col("event_id") % 23 == 0).count()
    kept = (
        all_queries()["stream_watermark_rollup"](spark, sf)
        .agg(F.sum("n_events"))
        .collect()[0][0]
    )
    dropped = total - kept
    assert 0 < dropped < late_pool, f"dropped {dropped} of {late_pool} stragglers"


@pytest.mark.parametrize("provider", ["hdfs", "rocksdb"])
def test_state_store_provider_parameterized(spark, tmp_path, provider):
    """The state-store seam (streaming/statestore.py): the same stateful
    aggregation must produce identical results under the default
    HDFS-backed provider and the RocksDB provider (the 100 TB posture —
    disk-backed state, changelog checkpointing). Spark bundles the
    RocksDB JNI, so both providers run in a stock session; the conf is
    read at query start, so a runtime pin is honored."""
    from reflex_spark.streaming.statestore import apply_state_store_conf, state_store_conf

    conf = state_store_conf(provider)
    assert "providerClass" in next(iter(conf))
    if provider == "rocksdb":
        assert (
            conf["spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"]
            == "true"
        )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        apply_state_store_conf(spark, provider)
        log = seed_log(
            spark,
            str(tmp_path / f"log_{provider}"),
            [(1, "a"), (1, "b"), (1, "a"), (2, "a"), (1, "c"), (2, "b")],
        )
        out = run_to_memory(
            running_count_per_key(log.read_stream(), key_col="foreign_id"),
            f"state_prov_{provider}",
            "update",
            spark,
        )
        counts = {r["foreign_id"]: r["n_events"] for r in out.collect()}
        assert counts == {"a": 3, "b": 2, "c": 1}
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )


def test_state_store_env_pin_reaches_judged_query(spark, monkeypatch):
    """REFLEX_SPARK_STATE_STORE=rocksdb must reach the judged stateful
    queries: stream_stateful_sessions runs (and matches its known
    per-user session semantics) under the RocksDB provider, because
    apply_state_store_conf is called inside the query body."""
    from reflex_spark.queries import all_queries

    monkeypatch.setenv("REFLEX_SPARK_STATE_STORE", "rocksdb")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        df = all_queries()["stream_stateful_sessions"](
            spark, "/root/testdata/sf0.001"
        )
        assert df.count() > 0
        # the query body applied the pin to the session
        assert "RocksDB" in spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )
