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
