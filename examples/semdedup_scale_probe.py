#!/usr/bin/env python
"""Scale probe for semantic dedup (VERDICT r7 next #1 follow-through):
quantifies the SemDeDup composition (k-means lists → within-list
candidate pairs → exact-cosine verify) against the exact blocked-GEMM
all-pairs path at a corpus size where the O(n²) term actually bites —
50,000 synthetic 64-dim embeddings, built fully executor-side (each
component a deterministic integer function of (id, dim), so clusters
exist by construction: 16 latent modes + per-vector noise).

Prints one JSON line with wall seconds + pair counts for both paths;
numbers recorded in SCALE_NOTES.md §16.

Run: python examples/semdedup_scale_probe.py  [N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from reflex_spark.operators.similarity import (
    cluster_scoped_cosine_pairs,
    cosine_pairs_blocked,
    ivf_assign_exact,
    kmeans_centroids_exact,
)
from reflex_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark(app_name="semdedup_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # 16 latent modes: mode m has base vector base(m, d) = ((m*73 + d*11)
    # % 19) - 9; a vector in mode (id % 16) adds small deterministic noise
    # ((id*31 + d*7) % 5) - 2 — vectors within a mode are near-duplicates,
    # across modes they are not. Entirely executor-side.
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: (
                ((F.col("id") % 16) * 73 + d.cast("long") * 11) % 19
                - 9
                + ((F.col("id") * 31 + d.cast("long") * 7) % 5 - 2) / F.lit(10.0)
            ).cast("double"),
        ).alias("embedding"),
    ).localCheckpoint()  # fix the input so both paths scan identical data

    t0 = time.time()
    cent = kmeans_centroids_exact(emb, n_lists=16, iters=2)
    assigned = ivf_assign_exact(emb, cent)
    sem_pairs = cluster_scoped_cosine_pairs(assigned, threshold=0.9)
    n_sem = sem_pairs.count()
    t_sem = time.time() - t0

    t0 = time.time()
    gemm_pairs = cosine_pairs_blocked(emb, threshold=0.9, rows_per_block=8192)
    n_gemm = gemm_pairs.count()
    t_gemm = time.time() - t0

    # candidate volume the semantic path actually verified (within-list
    # pair count before the threshold) vs the GEMM path's implicit n²/2
    sizes = assigned.groupBy("__cid").count().collect()
    n_cand = sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)

    print(
        json.dumps(
            {
                "n_vectors": n,
                "semdedup_wall_sec": round(t_sem, 2),
                "semdedup_pairs": n_sem,
                "semdedup_candidates": n_cand,
                "gemm_wall_sec": round(t_gemm, 2),
                "gemm_pairs": n_gemm,
                "allpairs": n * (n - 1) // 2,
                "recall_vs_exact": round(n_sem / n_gemm, 4) if n_gemm else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
