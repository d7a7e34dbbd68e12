"""Deterministic sampling for training-data pipelines.

Random sampling (``df.sample``) is seed- and partitioning-dependent — rerun
the pipeline, get a different dataset. These operators sample by *content
hash*, so the same row always makes the same decision, across runs, engines
and cluster sizes:

- hash_sample: keep a row iff the md5 of its key falls in the first
  ``rate`` fraction of hash space. Reproducible train/test splits, stable
  A/B cohorts, debuggable subsets.
- stratified_hash_sample: per-stratum rates (e.g. downsample dominant
  languages, keep the tail).

Both are pure JVM expressions (md5 + substring compare) and both have
byte-identical DuckDB SQL equivalents for the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 4 hex chars = 65536 buckets; rate resolution 1/65536.
_BUCKETS = 16**4


def _bucket(key: Column) -> Column:
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("long")


def sql_bucket(expr: str) -> str:
    """DuckDB equivalent of the hash bucket (hex compare avoids conv():
    both engines produce identical lowercase md5 hex)."""
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 4))::INT AS BIGINT)"


def hash_sample(df: DataFrame, key: Column | str, rate: float) -> DataFrame:
    """Keep ~rate of rows, decided by content hash of ``key``."""
    k = F.col(key) if isinstance(key, str) else key
    return df.where(_bucket(k) < int(rate * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame, key: Column | str, stratum: str, rates: dict[str, float], default_rate: float = 1.0
) -> DataFrame:
    """Per-stratum hash sampling: rates maps stratum value → keep rate."""
    k = F.col(key) if isinstance(key, str) else key
    b = _bucket(k)
    threshold = F.lit(int(default_rate * _BUCKETS))
    for value, rate in rates.items():
        threshold = F.when(F.col(stratum) == value, int(rate * _BUCKETS)).otherwise(threshold)
    return df.where(b < threshold)


def greedy_token_budget(
    df: DataFrame,
    key: str,
    token_col: Column,
    budget: Column,
    stratum: str,
) -> DataFrame:
    """Greedy per-stratum token-budget fill (corpus mixture weighting):
    within each ``stratum``, take documents in content-hash order until
    the cumulative token count reaches ``budget`` — the document that
    crosses the line is kept (standard greedy fill, so a budget > 0
    always yields at least one doc). Hash order makes the selection
    reproducible across runs/engines/cluster sizes; the cumulative sum is
    a per-stratum window (one shuffle on the stratum key), embarrassingly
    parallel across strata at 100 TB.

    Returns the input rows filtered to the kept set, with ``__cum_tokens``
    (cumulative count including the row) attached.
    """
    from pyspark.sql import Window

    k = F.col(key)
    order = [F.md5(k.cast("string")), k]
    w = (
        Window.partitionBy(stratum)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return (
        df.withColumn("__cum_tokens", cum)
        .where(F.col("__cum_tokens") - token_col < budget)
    )


def pack_sequences(
    df: DataFrame,
    key: str,
    token_col: Column,
    seq_len: int,
    shards: int,
) -> DataFrame:
    """Sequence packing (the pre-tokenization batching op): assign each
    document to a fixed-``seq_len``-token pack by contiguous greedy
    chunking — documents in content-hash order, a doc belongs to the pack
    where its tokens START. Packing is per-SHARD (content-hash shard of
    the doc id), NOT a global window: a global cumulative sum would
    serialize into one task, while per-shard windows scale linearly with
    shard count at 100 TB (shards ≈ cluster parallelism × a few).

    Returns the input with ``shard``, ``pack_id`` (within shard), and
    ``__cum_tokens`` attached.
    """
    from pyspark.sql import Window

    k = F.col(key)
    shard = F.pmod(_bucket(k), F.lit(shards))
    order = [F.md5(k.cast("string")), k]
    w = (
        Window.partitionBy("shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("shard", shard).withColumn(
        "__cum_tokens", F.sum(token_col).over(w)
    )
    return out.withColumn(
        "pack_id",
        F.floor((F.col("__cum_tokens") - token_col) / F.lit(seq_len)).cast("long"),
    )


def weighted_sample_wor(
    df: DataFrame,
    id_col: str,
    tier_col: Column,
    k: int,
    seed: str,
    max_tier: int = 3,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis,
    IPL 2006): each row draws a deterministic uniform u from its content
    hash and is ranked by the key u**(1/w); the k largest keys are the
    sample, with P(row is drawn first) = w / sum(w) exactly.

    Cross-engine design: weights are POWER-OF-TWO TIERS (w = 2**tier,
    tier in 0..max_tier), which turns u**(1/w) into an iterated sqrt —
    a fixed chain of correctly-rounded IEEE-754 ops that Spark and
    DuckDB evaluate bit-identically. Arbitrary real weights would need
    pow(u, 1/w), whose libm rounding differs between engines near
    top-k boundaries (the documented reason this operator quantizes
    weights; the same tradeoff class as MinHash banding). u is exact
    too: 52 hash bits + 1 over 2**52 — integer-in-double plus one
    power-of-two division, no rounding anywhere.

    Scale shape: one scan computing (u, key) JVM-side, then a global
    top-k = TakeOrdered (per-partition heaps + a k-row merge — the
    distributed reservoir; nothing data-sized moves). Adds columns
    __w (int weight) and __es_key (the E-S key)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + "|"), F.col(id_col).cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 52))
    tier = F.least(F.lit(max_tier), tier_col).cast("int")
    # when-cascade: tier t -> sqrt applied t times = u ** (1 / 2**t)
    chain = u
    key = F.when(tier == 0, u)
    w = F.when(tier == 0, 1)
    for t in range(1, max_tier + 1):
        chain = F.sqrt(chain)
        key = key.when(tier == t, chain)
        w = w.when(tier == t, 1 << t)
    return (
        df.withColumn("__w", w.cast("int"))
        .withColumn("__es_key", key)
        .orderBy(F.col("__es_key").desc(), F.col(id_col))
        .limit(k)
    )


def group_split(
    df: DataFrame,
    group: Column | str,
    fractions: dict[str, float],
    salt: str = "gsplit",
) -> DataFrame:
    """Add a ``split`` column assigning every row's GROUP to exactly one
    split — the leakage-free train/val/test split a training pipeline
    needs: a row-level random split puts one user's (or one document
    family's) rows on both sides of the train/eval boundary, and the
    model is then evaluated on groups it memorized.  Assignment is a
    salted content hash of the group key, so it is group-atomic by
    construction and reproducible across runs, engines, and cluster
    sizes; changing ``salt`` re-rolls the split without touching data.

    ``fractions``: ordered split name -> fraction (must sum to <= 1;
    any remainder falls into the LAST split).  Thresholds are integer
    bucket counts out of 65536, identical to the SQL twin
    ``sql_group_split``.
    """
    g = F.col(group) if isinstance(group, str) else group
    b = _bucket(F.concat(F.lit(salt + "|"), g.cast("string")))
    names = list(fractions)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        cond = b < int(cum * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def sql_group_split(expr: str, fractions: dict[str, float], salt: str = "gsplit") -> str:
    """DuckDB CASE expression byte-identical to ``group_split``."""
    bucket = (
        f"CAST(('0x' || substr(md5('{salt}|' || CAST({expr} AS VARCHAR)), 1, 4))"
        f"::INT AS BIGINT)"
    )
    names = list(fractions)
    cum = 0.0
    arms = []
    for name in names[:-1]:
        cum += fractions[name]
        arms.append(f"WHEN {bucket} < {int(cum * _BUCKETS)} THEN '{name}'")
    return "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END"
