"""Scale probes (slow): behavior on 10×-exploded data + compaction.

These don't prove 100 TB, but they catch the failure modes that appear
with growth: AQE partition planning on bigger shuffles, small-files scan
degradation, and result stability under repartitioning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reflex_spark.operators.dedup import minhash_lsh_pairs
from reflex_spark.queries.helpers import dsum
from reflex_spark.sources.event_log import EventLog
from reflex_spark.sources.memory import make_events
from reflex_spark.tables import load_tables


@pytest.mark.slow
def test_agg_stable_under_explosion_and_partitioning(spark, tmp_path):
    """Decimal-sum aggregates must be bit-identical regardless of data
    layout: 10x-replicated lineitem, shuffled partitioning, must produce
    exactly 10x the decimal sums."""
    li = load_tables(spark, "/root/testdata/sf0.01")["lineitem"]
    base = li.groupBy("l_returnflag").agg(dsum("l_extendedprice", "s")).collect()
    exploded = li.crossJoin(spark.range(10))
    big64 = {
        r["l_returnflag"]: r["s"]
        for r in exploded.repartition(64, "l_orderkey")
        .groupBy("l_returnflag")
        .agg(dsum("l_extendedprice", "s"))
        .collect()
    }
    big7 = {
        r["l_returnflag"]: r["s"]
        for r in exploded.repartition(7)
        .groupBy("l_returnflag")
        .agg(dsum("l_extendedprice", "s"))
        .collect()
    }
    assert big64 == big7  # bit-identical across layouts: the decimal path
    base_map = {r["l_returnflag"]: r["s"] for r in base}
    for k, v in base_map.items():
        # 10*v in Python float rounds; the decimal sum itself is exact
        assert big64[k] == pytest.approx(10 * v, rel=1e-12)


@pytest.mark.slow
def test_minhash_pairs_invariant_to_partitioning(spark):
    """LSH output is a deterministic function of the data, not the layout."""
    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    p1 = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()}
    p2 = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs.repartition(17), "doc_id", "text").collect()
    }
    assert p1 == p2 and p1


@pytest.mark.slow
def test_compaction_reduces_files_preserves_data(spark, tmp_path):
    log = EventLog(spark, str(tmp_path / "log"))
    for i in range(8):  # 8 appends → ≥8 file sets
        log.append(make_events(spark, [(1, f"u{i}"), (2, f"v{i}")]))
    import os

    def n_files():
        return sum(
            1
            for root, _, files in os.walk(log.path)
            for f in files
            if f.endswith(".parquet")
        )

    before = log.read().orderBy("event_id").collect()
    files_before = n_files()
    log.compact(target_partitions=1)
    assert n_files() < files_before
    after = log.read().orderBy("event_id").collect()
    assert [r["event_id"] for r in after] == [r["event_id"] for r in before]
    assert [r["foreign_id"] for r in after] == [r["foreign_id"] for r in before]
    # log still appendable after compaction
    log.insert("post-compact", 3)
    assert log.head() == 17


def test_compact_symlink_flip_atomic(spark, tmp_path):
    """After the one-time conversion, every compaction swaps a symlink
    atomically — the log path always resolves to a complete directory."""
    import os

    from reflex_spark.sources.memory import seed_log

    path = str(tmp_path / "slog")
    log = seed_log(spark, path, [(1, str(i)) for i in range(6)])
    log.compact(target_partitions=1)  # conversion: plain dir -> symlink
    assert os.path.islink(path)
    assert log.head() == 6
    log.insert("post", 2)  # append through the symlink
    assert log.head() == 7
    log.compact(target_partitions=1)  # atomic flip path
    assert os.path.islink(path)
    assert log.head() == 7
    assert log.read().count() == 7
    # exactly one data generation remains
    gens = [d for d in os.listdir(str(tmp_path)) if d.startswith("slog.data.")]
    assert len(gens) == 1


@pytest.mark.slow
def test_hygiene_and_packing_invariant_to_partitioning(spark):
    """The round-5 pipeline ops are deterministic functions of the DATA,
    not the layout: content-hash ordering (packing, token budget) and
    broadcast membership (decontamination) must produce identical results
    when the input arrives repartitioned."""
    from reflex_spark.queries import all_queries

    qs = all_queries()
    for name in ("text_sequence_packing", "sample_token_budget", "text_decontaminate"):
        base = {tuple(r) for r in qs[name](spark, "/root/testdata/sf0.001").collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        try:
            alt = {tuple(r) for r in qs[name](spark, "/root/testdata/sf0.001").collect()}
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
        assert base == alt and base, name


def test_packing_operators_shard_and_layout_contract(spark):
    """Operator-level pin for pack_sequences / greedy_token_budget
    (VERDICT r5 #8): results are a function of the DATA and the
    ``shards=``/``budget=`` parameters — identical under input
    repartitioning, but pack assignment legitimately CHANGES with the
    shard count (per-shard windows are the scale design; a result
    invariant to ``shards`` would mean a hidden global cumsum)."""
    from pyspark.sql import functions as F

    from reflex_spark.operators.sampling import greedy_token_budget, pack_sequences
    from reflex_spark.tables import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"].select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )

    def packed(df, shards):
        return {
            (r["doc_id"], r["shard"], r["pack_id"])
            for r in pack_sequences(df, "doc_id", F.col("n_tokens"), 256, shards).collect()
        }

    base = packed(docs, 8)
    assert base
    # (a) layout-invariant at fixed shards
    assert packed(docs.repartition(3), 8) == base
    assert packed(docs.repartition(17, "source"), 8) == base
    # (b) NOT shard-count-invariant: different shards → different packing
    assert packed(docs, 4) != base

    def kept(df, budget):
        return {
            (r["doc_id"], r["__cum_tokens"])
            for r in greedy_token_budget(
                df, "doc_id", F.col("n_tokens"), F.lit(budget), "source"
            ).collect()
        }

    kb = kept(docs, 5000)
    assert kb
    assert kept(docs.repartition(3), 5000) == kb
    assert kept(docs.repartition(17, "source"), 5000) == kb
    # budget is load-bearing: a different budget keeps a different prefix
    assert kept(docs, 500) != kb


def test_round6_queries_invariant_to_partitioning(spark):
    """Round-6 additions are functions of the data, not the layout:
    identical results under a different shuffle-partition count."""
    from reflex_spark.queries import all_queries

    qs = all_queries()
    names = (
        "graph_triangle_count",
        "text_boilerplate_spans",
        "sample_temperature_mixture",
        "events_first_touch_attribution",
        "sim_ann_pq_topk",
    )
    base = {
        n: {tuple(r) for r in qs[n](spark, "/root/testdata/sf0.001").collect()}
        for n in names
    }
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        for n in names:
            alt = {tuple(r) for r in qs[n](spark, "/root/testdata/sf0.001").collect()}
            assert alt == base[n] and base[n], n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
