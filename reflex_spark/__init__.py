"""reflex_spark — a brand-new PySpark-native analytics & event-stream engine.

Re-expresses the capabilities of the reference event-streaming framework
(luno/reflex, see SURVEY.md) on Spark primitives:

- ``reflex_spark.sources``   — event-log / blob / memory sources
  (reference: rsql/eventstable.go, rblob/blob.go, testutil.go)
- ``reflex_spark.streaming`` — consumer/run loop, consumer patterns
  (reference: run.go, consumer.go, rpatterns/*)
- ``reflex_spark.operators`` — relational + LLM-pipeline operators
  (dedup, similarity, text analysis, as-of joins, sessionization)
- ``reflex_spark.queries``   — the judged query registry (Spark callables +
  DuckDB oracle SQL), exported through ``__spark_entry__.py``

Design: DataFrame/SQL-first so Catalyst/Tungsten/AQE pick physical plans;
Pandas UDFs only where built-ins cannot express semantics. Every operator is
partition-parallel with no driver-side collects — built for 100 TB even
though tests run on local[32].
"""

from reflex_spark.session import get_spark
from reflex_spark.sources.event_log import EventLog, Gap, without_noops
from reflex_spark.sources.gapfill import fill_gaps
from reflex_spark.sources.head_cache import ErrConsecEvent, HeadCache
from reflex_spark.sources.sharded_log import ShardedEventLog
from reflex_spark.streaming.notify import InMemNotifier, StubNotifier
from reflex_spark.streaming import (
    Consumer,
    ErrHeadReached,
    FileCursorStore,
    MemCursorStore,
    ReadThroughCursorStore,
    Spec,
    StreamOptions,
    run,
    run_forever,
)
from reflex_spark.tables import TABLES, load_tables, register_views

__all__ = [
    "get_spark",
    "TABLES",
    "load_tables",
    "register_views",
    "EventLog",
    "ShardedEventLog",
    "without_noops",
    "Gap",
    "fill_gaps",
    "HeadCache",
    "ErrConsecEvent",
    "InMemNotifier",
    "StubNotifier",
    "Consumer",
    "ErrHeadReached",
    "FileCursorStore",
    "MemCursorStore",
    "ReadThroughCursorStore",
    "Spec",
    "StreamOptions",
    "run",
    "run_forever",
]

__version__ = "0.1.0"
