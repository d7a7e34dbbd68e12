#!/usr/bin/env python
"""Scale probe for connected components (VERDICT r4 #4): a 10^6-edge graph
with an adversarially deep 10^5-node chain component — the case min-label
propagation cannot survive (O(diameter) = 100k rounds) and the
large-star/small-star path exists for (O(log^2 n) rounds).

Graph (fully executor-side, no driver materialization):
- a 100_000-edge chain over nodes [0, 100_000]   (diameter 10^5)
- 900_000 pseudo-random edges (xxhash64-derived, deterministic) over
  nodes [200_000, 1_200_000)

Prints one JSON line with rounds + wall seconds; the numbers are recorded
in SCALE_NOTES.md §8.

Run: python examples/cc_scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from reflex_spark.operators.dedup import connected_components_star
from reflex_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="cc_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    chain = spark.range(100_000).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    rand = spark.range(900_000).select(
        (F.lit(200_000) + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000))).alias(
            "id_a"
        ),
        (F.lit(200_000) + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1_000_000))).alias(
            "id_b"
        ),
    )
    edges = chain.unionByName(rand)

    t0 = time.perf_counter()
    labels, rounds = connected_components_star(edges, max_rounds=60)
    n_nodes = labels.count()
    chain_labels = (
        labels.where(F.col("node") <= 100_000).select("label").distinct().collect()
    )
    wall = time.perf_counter() - t0

    assert [r["label"] for r in chain_labels] == [0], chain_labels
    print(
        json.dumps(
            {
                "edges": 1_000_000,
                "chain_depth": 100_000,
                "nodes_labeled": n_nodes,
                "rounds": rounds,
                "wall_sec": round(wall, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
