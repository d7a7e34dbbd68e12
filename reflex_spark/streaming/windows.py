"""Streaming windowed operators: tumbling/sliding/session windows,
watermarked dedup, and custom per-key state (SURVEY.md §2.2 streaming rows).

These are the *streaming* forms of the judged batch queries in
reflex_spark.queries.events (reference analogue: the batch-window consumer
rpatterns/batch.go = tumbling processing-time window; SURVEY.md §2.1 P1).
Each helper takes/returns streaming DataFrames so callers compose them with
EventLog.read_stream() and run_stream().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "timestamp",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time window counts with a watermark: late rows beyond
    the watermark are dropped, state is bounded (required at 100 TB —
    unbounded state is the streaming OOM)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), key_col, "n_events")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "timestamp",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "timestamp",
    key_col: str = "foreign_id",
) -> DataFrame:
    """Session windows (inactivity gap) — the streaming form of the judged
    events_session_count batch query."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    dropDuplicatesWithinWatermark keeps each key's state only within the
    watermark horizon (the 100 TB answer to 'dedup an infinite stream')."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "timestamp",
    right_ts: str = "timestamp",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: right events within
    ``within`` after the left event on the same key (SURVEY §2.2 joins row,
    'stream-stream join with watermark').

    Both sides carry watermarks so the join state is bounded: a buffered
    left row can be evicted once the right watermark passes
    left_ts + within. Column names are prefixed l_/r_ to avoid collisions.
    """
    lt, rt = f"l_{left_ts}", f"r_{right_ts}"
    l = left.withWatermark(left_ts, watermark).select(
        F.col(key).alias("l_key"),
        F.col(left_ts).alias(lt),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key, left_ts)],
    )
    r = right.withWatermark(right_ts, watermark).select(
        F.col(key).alias("r_key"),
        F.col(right_ts).alias(rt),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key, right_ts)],
    )
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {within}")),
    )


def running_count_per_key(
    events: DataFrame,
    key_col: str = "foreign_id",
    ts_col: str = "timestamp",
    watermark: str = "2 hours",
):
    """Custom per-key state via applyInPandasWithState: a running event
    count per key, emitted once per microbatch. Demonstrates the
    reference's stateful-consumer surface (SURVEY.md §2.2 'Stateful ops':
    cursor/batch-buffer state) on Spark's state store.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} string, n_events long"
    state_schema = "n long"

    def update(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n]})

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
