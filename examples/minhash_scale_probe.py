"""MinHash-LSH dedup at corpus scale: 200k synthetic documents with a
CONTROLLED duplicate structure, so the probe measures not just wall time
but banding quality — recall of planted near-dups and the candidate:
verified ratio (how much work the band join hands the exact-Jaccard
verify stage).

The corpus is synthesized JVM-side (no Python row generation): each
document is 40 words drawn deterministically from its base id; every
third document is a 1-word mutation of a base (word-3-shingle Jaccard
35/41 ≈ 0.854 ≥ 0.8 — a planted NEAR-DUP the pipeline must find), the
rest are distinct bases (planted NON-dups the verify stage must reject
if the bands collide).

Measures, per stage: pair generation (shingle → 16 minhashes → 4-band
bucket join → exact-Jaccard verify) and the star-closure clustering over
the found pairs — the two heavyweight stages of every 100 TB fuzzy-dedup
pass.

Run:  python examples/minhash_scale_probe.py  [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflex_spark.operators.dedup import (
    connected_components_star,
    minhash_lsh_pairs,
)
from reflex_spark.session import get_spark

WORDS = 40
VOCAB = 50_000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="minhash_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # doc i: base = i // 3 * 3; docs with i % 3 == 1 mutate ONE word
    # (position 20) of their base — a planted near-dup pair (base, base+1)
    # per triple; i % 3 == 2 is an independent base (distinct text).
    base = (F.col("doc_id") - (F.col("doc_id") % 3)) + F.when(
        F.col("doc_id") % 3 == 2, F.lit(2)
    ).otherwise(F.lit(0))
    mutate = F.col("doc_id") % 3 == 1
    # md5-derived words: a linear-congruential generator here plants
    # accidental shift-by-one near-dups (7*(b2-b1) ≡ -13 mod VOCAB gives
    # doc pairs sharing 37/39 shingles — found the hard way); hashing
    # removes all arithmetic structure between bases
    word = lambda j: F.concat(  # noqa: E731
        F.lit("w"),
        F.substring(
            F.md5(F.concat(base.cast("string"), F.lit(f"_{j}"))), 1, 8
        ),
    )
    words = [
        F.when(mutate & F.lit(j == 20), F.concat(F.lit("m"), F.col("doc_id").cast("string")))
        .otherwise(word(j))
        for j in range(WORDS)
    ]
    docs = (
        spark.range(n)
        .select(F.col("id").alias("doc_id"))
        .select("doc_id", F.concat_ws(" ", *words).alias("text"))
    )
    n_planted = n // 3  # one near-dup pair per triple

    t0 = time.time()
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.8
    ).cache()
    n_pairs = pairs.count()
    t_pairs = time.time() - t0
    planted_found = pairs.where(
        (F.col("id_b") - F.col("id_a") == 1) & (F.col("id_a") % 3 == 0)
    ).count()
    print(
        f"pairs: {n:,} docs -> {n_pairs:,} verified near-dup pairs in "
        f"{t_pairs:.1f}s | planted recall {planted_found}/{n_planted} "
        f"= {planted_found / n_planted:.4f}"
    )

    t0 = time.time()
    cc, rounds = connected_components_star(pairs.select("id_a", "id_b"))
    n_losers = cc.where(F.col("node") != F.col("label")).count()
    t_cc = time.time() - t0
    print(
        f"closure: {n_losers:,} docs marked for deletion in {t_cc:.1f}s "
        f"({rounds} star rounds)"
    )
    pairs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
