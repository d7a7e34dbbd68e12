"""Runtime Bloom-filter join reduction: prune the big side BEFORE the shuffle.

The scale problem: a selective dimension-side predicate (e.g. "urgent
finished orders") joined against a 100 TB fact table still shuffles EVERY
fact row to the join, because the fact side cannot know which keys survive
the other side's filter until the join executes. Engines close this with
runtime filters (Spark's own `spark.sql.optimizer.runtimeFilter.*`
semi-join/Bloom rewrite, which Catalyst only applies under cost
heuristics): build a compact membership sketch of the small side's join
keys, broadcast it, and drop non-matching fact rows AT THE SCAN, so the
shuffle carries ~|matches| rows instead of |fact|.

This module is the explicit, always-on form of that rewrite, built on the
repo's sketch family (`operators/dedup._md5_mod` — one hash definition
shared by every Bloom in the codebase, so build and probe can never
drift):

- ``bloom_build(small, key)``: one distributed pass over the build side —
  k bit positions per key (explode), bit positions folded into 64-bit
  words with ``bit_or`` partial aggregation, then a BOUNDED collect of at
  most m/64 = 1024 rows (control-plane sized: the sketch is 8 KiB
  regardless of build-side row count, exactly like TxTable's per-file
  Blooms).
- ``bloom_prefilter(big, key, words)``: a pure JVM predicate — k md5
  bucket computations, an 1024-long array LITERAL lookup, shiftright +
  mask — so it rides inside whole-stage codegen at the fact scan; no
  Python touches the hot path, no shuffle is added.
- ``bloom_semi_join(big, small, on)``: prefilter + real join. The Bloom
  has NO false negatives by construction (every true key sets its bits),
  so the prefilter is a superset of the true semi-join and the subsequent
  join makes the composition EXACT — false positives only cost shuffle
  bytes, never correctness.

Sizing: m = 65536 bits, k = 4 → fp ≈ (1 - e^(-4n/65536))^4: under 1e-4
up to ~2k build keys, ~2.7% at 20k; past that, raise ``m_bits`` (the
sketch stays broadcast-trivial up to millions of bits) — the same
saturation economics as TxTable's per-file Blooms (SCALE_NOTES).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reflex_spark.operators.dedup import _md5_mod

_DEFAULT_M = 65536  # bits; 1024 longs, 8 KiB broadcast
_DEFAULT_K = 4


def bloom_build(
    df: DataFrame, key: str, m_bits: int = _DEFAULT_M, k: int = _DEFAULT_K
) -> list[int]:
    """One pass over the build side → the Bloom bitmap as m/64 signed
    64-bit words. NULL keys are excluded (they never join anyway, and
    _md5_mod's cross-engine NULL contract requires it)."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    js = F.array(*[F.lit(j) for j in range(k)])
    words = (
        df.where(F.col(key).isNotNull())
        .select(F.col(key).alias("__k"), F.explode(js).alias("__j"))
        .select(_md5_mod(F.col("__k"), F.col("__j"), m_bits).alias("__pos"))
        .select(
            (F.col("__pos") / 64).cast("int").alias("__w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))"
            ).alias("__bit"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__bit").alias("__word"))
        .collect()  # bounded: at most m_bits/64 rows (1024 by default)
    )
    bm = [0] * (m_bits // 64)
    for r in words:
        bm[r["__w"]] = r["__word"]
    return bm


def _bloom_cond(df: DataFrame, key: str, words: list[int], m_bits: int, k: int):
    """Internal: (df-with-temp-columns, membership condition, temp names).
    Temp columns exist because pyspark's shiftright takes only a literal
    shift — the per-hash bit offset must be a named column inside an
    F.expr."""
    bm = F.lit(words)
    cond = None
    probe = df
    drop_cols = []
    for j in range(k):
        pos = _md5_mod(F.col(key), F.lit(j), m_bits)
        wcol, bcol = f"__rf_w{j}", f"__rf_b{j}"
        probe = probe.withColumn(
            wcol, F.element_at(bm, (pos / 64).cast("int") + 1)
        ).withColumn(bcol, (pos % 64).cast("int"))
        bit = F.expr(f"shiftright({wcol}, {bcol}) & 1") == 1
        cond = bit if cond is None else (cond & bit)
        drop_cols += [wcol, bcol]
    return probe, cond, drop_cols


def bloom_prefilter(
    df: DataFrame,
    key: str,
    words: list[int],
    m_bits: int = _DEFAULT_M,
    k: int = _DEFAULT_K,
) -> DataFrame:
    """Keep only rows whose ``key`` MIGHT be in the built set — a pure
    JVM whole-stage-codegen predicate (array-literal lookup + shift +
    mask per hash). Guaranteed superset of the true members."""
    probe, cond, drop_cols = _bloom_cond(df, key, words, m_bits, k)
    return probe.where(cond).drop(*drop_cols)


# NOTE a "bloom_flagged" variant (unfiltered frame + boolean pass column,
# pins via one conditional aggregate, no cache) was built and MEASURED
# slower at sf0.1: without the cache every downstream consumer (the
# completeness anti-join, the final join) re-evaluates the 4-hash md5
# probe over the full fact — 3 probe passes ≈ 3x the cached plan's cost,
# and caching the flagged frame instead would pin the FULL fact rather
# than the ~6.7% survivor set. The cached bloom_prefilter + explicit
# unpersist in the caller is the measured optimum (SCALE_NOTES §53).


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    m_bits: int = _DEFAULT_M,
    k: int = _DEFAULT_K,
    how: str = "inner",
) -> DataFrame:
    """EXACT join with runtime Bloom reduction of the big side: build the
    sketch from ``small``'s keys, prefilter ``big`` at its scan, then run
    the real join. No false negatives → bit-identical to the plain join;
    false positives are removed by the join itself.

    Only inner/semi joins are accepted: an outer or anti join KEEPS
    unmatched big-side rows, so pre-dropping true non-members (with
    fp-dependent survivors) would corrupt the result instead of just
    saving shuffle."""
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            f"bloom_semi_join supports inner/semi joins only, got {how!r}: "
            "outer/anti joins keep unmatched big-side rows, which the "
            "prefilter would drop fp-dependently"
        )
    sk = small_key or big_key
    # Bloom hashing is only join-equivalent when both sides hash the SAME
    # rendering: _md5_mod hashes CAST(key AS STRING), so a cross-type key
    # pair the equi-join would cast-and-match (bigint 7 vs string '007')
    # hashes to different bits — a FALSE NEGATIVE that silently drops join
    # rows. Same hazard TxTable._prune_types_match guards; on a type
    # mismatch skip the prefilter and run the plain (still exact) join.
    big_t = big.schema[big_key].dataType.simpleString()
    small_t = small.schema[sk].dataType.simpleString()
    if big_t == small_t:
        bm = bloom_build(small, sk, m_bits, k)
        pre = bloom_prefilter(big, big_key, bm, m_bits, k)
    else:
        pre = big
    if small_key and small_key != big_key:
        return pre.join(small, pre[big_key] == small[small_key], how)
    return pre.join(small, big_key, how)
