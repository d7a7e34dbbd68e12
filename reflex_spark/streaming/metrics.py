"""Metrics: consumer lag/throughput instrumentation (reference M1,
internal/metrics/metrics.go + rsql/metrics.go).

Mapping (SURVEY.md §2.1 M1):
- consumer lag gauge        → max(now - timestamp) over the unconsumed tail
- consume latency histogram → StreamingQueryProgress batchDuration
- events consumed/skipped   → Consumer.stats counters (consumer.py)
- rows/s                    → StreamingQueryProgress inputRowsPerSecond
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import functions as F

from reflex_spark.sources.event_log import EventLog
from reflex_spark.streaming.cursors import CursorStore


def consumer_lag_seconds(log: EventLog, cstore: CursorStore, consumer: str) -> float:
    """Age of the oldest unconsumed event (reference lag gauge,
    consumer.go:153-161): 0.0 when fully caught up."""
    cursor = cstore.get_cursor(consumer)
    row = (
        log.read()
        .where(F.col("event_id") > cursor)
        .agg(
            F.max(
                F.unix_timestamp(F.current_timestamp()) - F.unix_timestamp("timestamp")
            ).alias("lag")
        )
        .collect()[0]
    )
    return float(row["lag"]) if row["lag"] is not None else 0.0


def lag_alert(
    log: EventLog, cstore: CursorStore, consumer: str, threshold_seconds: float = 30 * 60
) -> bool:
    """Consumer lag alert (reference WithConsumerLagAlert, consumer.go:13-15,
    default 30 min): True when the oldest unconsumed event exceeds the
    threshold — wire into whatever pager replaces the prometheus alert."""
    return consumer_lag_seconds(log, cstore, consumer) > threshold_seconds


@dataclass
class ProgressMetrics:
    """Collects StreamingQueryProgress events (the Spark-native metric bus).

    Use: listener = ProgressMetrics.attach(spark); ... run queries ...;
    listener.rates / listener.batch_durations_ms hold per-batch series.
    """

    rates: list[float] = field(default_factory=list)
    rows: list[int] = field(default_factory=list)
    batch_durations_ms: list[int] = field(default_factory=list)

    @classmethod
    def attach(cls, spark) -> "ProgressMetrics":
        from pyspark.sql.streaming import StreamingQueryListener

        metrics = cls()

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                metrics.rows.append(p.numInputRows)
                if p.inputRowsPerSecond is not None:
                    metrics.rates.append(p.inputRowsPerSecond)
                if p.batchDuration is not None:
                    metrics.batch_durations_ms.append(p.batchDuration)

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        listener = _Listener()
        spark.streams.addListener(listener)
        metrics._listener = listener  # keep alive / allow detach
        metrics._spark = spark
        return metrics

    def detach(self) -> None:
        self._spark.streams.removeListener(self._listener)
