"""Quickstart: the full reflex_spark surface in one script.

Run: python examples/quickstart.py  (uses a temp directory; ~1 min)

Walks the reference workflow end-to-end — produce events, consume with
cursors + dead-letter, supervise, then the analytics/LLM-pipeline surface:
aggregate, dedup, similarity search — all on the same SparkSession.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from reflex_spark import (
    Consumer,
    ErrHeadReached,
    EventLog,
    FileCursorStore,
    Spec,
    StreamOptions,
    get_spark,
    run,
)
from reflex_spark.operators.dedup import minhash_lsh_pairs
from reflex_spark.operators.similarity import cosine_topk
from reflex_spark.sources.memory import make_events
from reflex_spark.streaming.patterns import dead_letter_consumer, read_consumer_errors


def main(workdir: str | None = None) -> dict:
    spark = get_spark(app_name="quickstart", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    d = workdir or tempfile.mkdtemp(prefix="reflex_spark_qs_")
    results: dict = {}

    # 1. Produce: an append-only event log with dense ids -----------------
    log = EventLog(spark, f"{d}/events")
    log.append(make_events(spark, [(1, f"user{i % 4}") for i in range(10)]))
    log.insert(foreign_id="user9", event_type=2)
    results["head"] = log.head()  # 11

    # 2. Consume: cursor-tracked, at-least-once, fail-fast ---------------
    store = FileCursorStore(f"{d}/cursors")
    seen: list[int] = []
    spec = Spec(
        log,
        store,
        Consumer("quickstart", lambda df, meta: seen.extend(
            r["event_id"] for r in df.select("event_id").collect())),
        StreamOptions(to_head=True, batch_limit=5),
    )
    try:
        run(spec)
    except ErrHeadReached:
        pass
    results["consumed"] = len(seen)  # 11, in order, cursor now at head

    # 3. Dead-letter: poison events recorded, stream never blocks --------
    def handler(row: dict) -> None:
        if row["foreign_id"] == "user2":
            raise ValueError("cannot process user2")

    dlq = dead_letter_consumer("dlq", handler, f"{d}/errors", retries=1)
    try:
        run(Spec(log, FileCursorStore(f"{d}/cursors2"), dlq, StreamOptions(to_head=True)))
    except ErrHeadReached:
        pass
    results["dead_lettered"] = read_consumer_errors(spark, f"{d}/errors").count()

    # 4. Analytics over the driver fixtures ------------------------------
    from reflex_spark.tables import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    results["events_per_type"] = (
        t["events"].groupBy("event_type").count().orderBy("event_type").collect()
    )

    # 5. LLM-pipeline: fuzzy dedup + similarity search --------------------
    results["near_dup_pairs"] = minhash_lsh_pairs(
        t["documents"], "doc_id", "text", threshold=0.8
    ).count()
    q = t["embeddings"].where(F.col("vec_id") == 0)
    results["nearest"] = [
        (r["vec_id"], r["cos_sim"]) for r in cosine_topk(t["embeddings"], q, k=3).collect()
    ]
    return results


if __name__ == "__main__":
    for k, v in main().items():
        print(f"{k}: {v}")
