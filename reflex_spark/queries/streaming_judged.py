"""Judged query that exercises the streaming machinery end-to-end.

`stream_rollup_counts` consumes the events fixture through the engine's
poll run loop (cursor store, batch limits, at-least-once consume) into an
incrementally-merged materialized rollup — then returns the rollup. The
oracle is the plain SQL aggregate over the same events: if the consume
loop dropped, duplicated, or mis-merged anything, the hash check fails.
Decimal sums make the incremental merge bit-identical to the one-shot
aggregate regardless of batch boundaries.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reflex_spark.queries import query
from reflex_spark.queries.helpers import sql_dsum
from reflex_spark.streaming import Consumer, ErrHeadReached, MemCursorStore, Spec, StreamOptions, run
from reflex_spark.streaming.materialize import MaterializedCounts
from reflex_spark.tables import load_tables


class _FixtureEventsLog:
    """Adapter: the read-only events fixture viewed as an event log
    (duck-typed for the run loop: head / read / read_after)."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self._df = load_tables(spark, sf_dir)["events"]

    def head(self) -> int:
        row = self._df.agg(F.max("event_id").alias("m")).collect()[0]
        return row["m"] if row["m"] is not None else 0

    def read(self) -> DataFrame:
        return self._df

    def read_after(
        self, after: int, limit: int | None = None, dense_only: bool = False
    ) -> DataFrame:
        # fixture ids are dense and static; the gap guard is a no-op here
        df = self._df.where(F.col("event_id") > after).orderBy("event_id")
        return df.limit(limit) if limit else df


@query(
    "stream_rollup_counts",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY event_type
    """,
)
def stream_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consume the fixture through run() in 2000-event batches, merging
    each batch into a persistent rollup; return the rollup. Exactness of
    the incremental path against the one-shot SQL aggregate IS the test."""
    log = _FixtureEventsLog(spark, sf_dir)
    rollup_path = tempfile.mkdtemp(prefix="stream_rollup_") + "/table"
    mat = MaterializedCounts(spark, rollup_path, keys=["event_type"], value_col="value")
    # A fixed count of incremental merges at any SF (≈5 batches): the
    # correctness value is the merge across batch boundaries, not the
    # number of loop rounds — a constant limit made the bench O(SF) in
    # driver round-trips (50 rounds × rollup read-modify-write at sf0.1).
    batch_limit = max(2000, log.head() // 5 + 1)
    spec = Spec(
        log,  # type: ignore[arg-type] — duck-typed log
        # fixture ids start at 0 (the engine's own logs start at 1), so the
        # initial exclusive cursor must sit below the first id
        MemCursorStore({"stream_rollup": -1}),
        Consumer("stream_rollup", mat.apply_batch),
        StreamOptions(to_head=True, batch_limit=batch_limit, drop_noops=False),
    )
    try:
        run(spec)
    except ErrHeadReached:
        pass
    return mat.read().select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
    )
