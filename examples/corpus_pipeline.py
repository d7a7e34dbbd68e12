"""Corpus-hygiene pipeline walkthrough: the round-5 training-data surface
chained end-to-end on the fixture corpus, plus the transactional tail
(TxTable with data skipping + CDC back into an event log).

Run: python examples/corpus_pipeline.py   (~1 min, temp directory)

Stages (each also individually judged against DuckDB — see
reflex_spark/queries/text.py and pipeline.py):
  1. exact dedup          keep min(doc_id) per identical text
  2. Gopher-style gate    token/word-length/stopword/digit-ratio bounds
  3. decontamination      drop docs sharing >=2 word 3-grams with the
                          held-out eval set (broadcast membership join)
  4. PII redaction        emails/SSNs/IPv4s -> typed placeholders
  5. repetition removal   order-preserving 5-word-segment dedup
  6. mixture + packing    greedy per-source token budgets, then 256-token
                          per-shard sequence packs
  7. transactional sink   TxTable append + MERGE with file skipping,
                          change feed published to an EventLog
"""

from __future__ import annotations

import sys
import tempfile
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from reflex_spark import EventLog, get_spark
from reflex_spark.operators.dedup import exact_dedup
from reflex_spark.operators.sampling import greedy_token_budget, pack_sequences
from reflex_spark.operators.text import (
    avg_word_len,
    contamination_overlap,
    digit_token_count,
    redact_pii,
    segment_dedup,
    stopword_count,
    token_count,
)
from reflex_spark.sources.tx_table import TxTable
from reflex_spark.streaming.cdc import publish_changes
from reflex_spark.tables import load_tables


def main(sf_dir: str = "/root/testdata/sf0.01") -> dict:
    spark = get_spark(app_name="corpus_pipeline", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="corpus_pipe_")
    out: dict = {}

    docs = load_tables(spark, sf_dir)["documents"]
    out["input_docs"] = docs.count()

    # 1. exact dedup
    keep = exact_dedup(docs, ["text"], "doc_id").select("doc_id")
    docs = docs.join(keep, "doc_id", "left_semi")

    # 2. quality gate
    n = token_count("text")
    docs = docs.where(
        (n >= 30) & (n <= 100000)
        & (avg_word_len("text") >= 2.5) & (avg_word_len("text") <= 8.0)
        & (stopword_count("text").cast("double") / n.cast("double") >= 0.01)
        & (digit_token_count("text").cast("double") / n.cast("double") <= 0.2)
    )

    # 3. decontamination (doc_id % 97 == 0 stands in for the benchmark)
    ev = load_tables(spark, sf_dir)["documents"].where(F.col("doc_id") % 97 == 0)
    flags = contamination_overlap(docs.where(F.col("doc_id") % 97 != 0), ev)
    docs = (
        docs.where(F.col("doc_id") % 97 != 0)
        .join(flags.where("contaminated").select("doc_id"), "doc_id", "left_anti")
    )

    # 4 + 5. redact, then drop repeated 5-word segments
    docs = docs.withColumn("text", redact_pii("text"))
    docs = docs.withColumn("text", F.concat_ws(" ", segment_dedup("text", 5)))
    out["clean_docs"] = docs.count()

    # 6. mixture budget per source, then sequence packing
    budgeted = greedy_token_budget(
        docs.withColumn("n_tokens", token_count("text")),
        "doc_id",
        F.col("n_tokens"),
        F.lit(500).cast("long"),
        "source",
    )
    packed = pack_sequences(budgeted, "doc_id", F.col("n_tokens"), 256, shards=4)
    out["packs"] = packed.select("shard", "pack_id").distinct().count()

    # 7. transactional sink with data skipping, CDC into an event log
    table = TxTable(spark, f"{d}/corpus", stats_cols=["doc_id"])
    table.append(packed.select("doc_id", "source", "text", "shard", "pack_id",
                               F.lit(1).alias("rev")))
    v0 = table.latest_version()
    # a re-crawl updates one document: file-level MERGE, skipped files
    upd = packed.limit(1).select(
        "doc_id", "source",
        F.concat(F.col("text"), F.lit(" v2")).alias("text"),
        "shard", "pack_id", F.lit(2).alias("rev"),
    )
    table.merge_by_key(upd, ["doc_id"], "rev")
    log = EventLog(spark, f"{d}/changes")
    # 'at' must be explicit (deterministic replay contract) — use the
    # pipeline's logical run date, not the driver clock.
    publish_changes(table, log, "doc_id", v0, at=datetime(2024, 6, 1))
    out["change_events"] = log.read().count()
    return out


if __name__ == "__main__":
    print(main())
