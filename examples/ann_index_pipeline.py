"""End-to-end ANN index lifecycle walkthrough of the round-14 surface.

A miniature "vector platform day": build a persisted IVF index once,
ingest two append batches against the existing centroids (no refit,
no rewrite of existing partition files), watch the growth ledger, let
an overgrown list re-split locally, and probe — the probe reads only
the centroids (kilobytes) plus the probed list partitions.

Run:  python examples/ann_index_pipeline.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflex_spark.operators.similarity import IvfIndex
from reflex_spark.session import get_spark
from reflex_spark.tables import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="ann_index_pipeline")
    emb = load_tables(spark, sf_dir)["embeddings"]
    cent = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("list_id"),
        F.col("embedding").alias("centroid"),
    )

    with tempfile.TemporaryDirectory(prefix="ann_index_") as base:
        # 1. index-build job: runs ONCE over the seed corpus
        idx = IvfIndex.build(
            spark, f"{base}/idx", emb.where(F.col("vec_id") % 3 == 0), cent
        )
        print("built; per-list counts:", idx.list_counts())

        # 2. continuous ingest: each batch assigns against the EXISTING
        # centroids — O(batch), never O(corpus)
        for r in (1, 2):
            added = idx.append(emb.where(F.col("vec_id") % 3 == r))
            print(f"append batch {r}: +{sum(added.values())} vectors")

        # 3. maintenance: re-split whatever outgrew its list, locally
        counts = idx.list_counts()
        threshold = int(1.5 * sum(counts.values()) / len(counts))
        split = idx.maybe_split(threshold)
        print(f"split lists over {threshold}: {split}")

        # 4. probe job: broadcast centroids + partition-pruned list scan
        queries = emb.where(F.col("vec_id").isin(0, 1, 2)).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
        )
        top = idx.probe(queries, n_probe=4, k=5)
        top.orderBy("q_id", F.col("cos_sim").desc()).show(15, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
