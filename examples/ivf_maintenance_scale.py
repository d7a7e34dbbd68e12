"""IVF index MAINTENANCE at scale: 6M synthetic vectors (VERDICT r14
Next #7) — measures what the round-15 ledger rework changed:

- ``append`` over a large established index must cost O(batch), and its
  ledger read-back must be O(touched partitions), NOT O(index): the
  probe prints ``last_append_readback`` (dirs stat'ed / dirs listed /
  files whose footers were read) next to the wall time so the
  metadata-cost claim is a measurement, not a docstring.
- ``maybe_split`` of one overgrown list must cost O(|that list|) while
  the other lists hold millions of vectors.
- a snapshot ``probe`` against the post-maintenance index must stay
  O(lists probed).

Vectors are synthesized JVM-side (deterministic trig of the id — no
Python row generation) in 8 dims so 6M rows build in seconds and the
timings isolate the maintenance machinery rather than vector math.

Run:  python examples/ivf_maintenance_scale.py  [n_vectors]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflex_spark.operators.similarity import IvfIndex
from reflex_spark.session import get_spark

DIMS = 8
N_LISTS = 64


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    spark = get_spark(app_name="ivf_maintenance_scale")
    spark.sparkContext.setLogLevel("ERROR")

    def vecs(lo: int, hi: int):
        base = spark.range(lo, hi).select(F.col("id").alias("vec_id"))
        # constant first component: a pure-trig vector can round to
        # all-zeros for ids where vec_id/10 approximates a multiple of
        # pi across every dim (hit at ~6M scale) — and a zero-norm
        # vector's cosine is undefined (ANSI divide-by-zero)
        comps = [F.lit(1.0)] + [
            F.round(F.sin((F.col("vec_id") + 1) * F.lit(0.1 * (d + 1))), 6)
            for d in range(DIMS - 1)
        ]
        return base.select("vec_id", F.array(*comps).alias("embedding"))

    # centroids: the first N_LISTS vectors' embeddings (caller owns the fit)
    cent = vecs(0, N_LISTS).select(
        F.col("vec_id").cast("int").alias("list_id"),
        F.col("embedding").alias("centroid"),
    )

    with tempfile.TemporaryDirectory(prefix="ivf_scale_") as base:
        path = f"{base}/idx"
        seed_n = n * 9 // 10
        t0 = time.time()
        idx = IvfIndex.build(spark, path, vecs(0, seed_n), cent)
        t_build = time.time() - t0
        n_files = sum(len(v) for v in idx._read_meta()["files"].values())
        print(
            f"build: {seed_n:,} vectors -> {len(idx.list_counts())} lists, "
            f"{n_files} files, {t_build:.1f}s"
        )

        # --- append: O(batch) work, O(touched partitions) ledger update
        t0 = time.time()
        added = idx.append(vecs(seed_n, n))
        t_append = time.time() - t0
        rb = idx.last_append_readback
        print(
            f"append: +{sum(added.values()):,} vectors into "
            f"{len(added)} lists, {t_append:.1f}s | ledger read-back: "
            f"listed {rb['dirs_listed']} touched dirs, read footers of "
            f"{rb['files_read']} files "
            f"(index holds {n_files + rb['files_read']}+)"
        )

        # --- split: O(|one list|) while the index holds millions
        counts = idx.list_counts()
        big = max(counts, key=lambda k: counts[k])
        t0 = time.time()
        split = idx.maybe_split(threshold=counts[big] - 1, lists=[big])
        t_split = time.time() - t0
        print(
            f"split: list {big} ({counts[big]:,} vectors) -> {split}, "
            f"{t_split:.1f}s (corpus {n:,})"
        )

        # --- probe: O(lists probed) regardless of index size
        q = vecs(0, 8).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
        )
        t0 = time.time()
        approx = idx.probe(q, n_probe=4, k=10)
        got = {
            (r["q_id"], r["vec_id"]) for r in approx.collect()
        }  # bounded: 80 rows
        t_probe = time.time() - t0
        print(f"probe: 8 queries x 4 lists -> {len(got)} rows, {t_probe:.1f}s")

        # --- recall@10 vs the exact answer over the FULL corpus: the
        # brute-force pass scans all n vectors per query (the thing the
        # index exists to avoid) and provides the ground truth the
        # 4-of-64-lists probe is judged against
        from pyspark.sql import Window

        from reflex_spark.operators.similarity import cosine

        t0 = time.time()
        wq = Window.partitionBy("q_id").orderBy(
            F.col("cos_sim").desc(), F.col("vec_id")
        )
        exact = {
            (r["q_id"], r["vec_id"])
            for r in vecs(0, n)
            .join(F.broadcast(q))
            .where(F.col("vec_id") != F.col("q_id"))
            .select(
                "q_id",
                "vec_id",
                cosine(F.col("embedding"), F.col("qv")).alias("cos_sim"),
            )
            .withColumn("__rnk", F.row_number().over(wq))
            .where(F.col("__rnk") <= 10)
            .collect()  # bounded: 80 rows
        }
        t_exact = time.time() - t0
        print(
            f"recall@10: {len(got & exact)}/{len(exact)} "
            f"= {len(got & exact) / len(exact):.3f} "
            f"(exact brute force over {n:,} vectors took {t_exact:.1f}s "
            f"vs {t_probe:.1f}s probed)"
        )

        # --- compact (round 16): drip-feed 4 more appends so every
        # touched list fragments (one file per list per batch), then
        # measure the OPTIMIZE pass — wall time, ledger file-count
        # bound, and probe BIT-EQUALITY across the rewrite
        drip = max(10_000, n // 120)
        for i in range(4):
            idx.append(vecs(n + i * drip, n + (i + 1) * drip))
        meta = idx._read_meta()
        frag_files = sum(len(v) for v in meta["files"].values())
        frag_lists = sum(1 for v in meta["files"].values() if len(v) >= 2)
        before = {
            tuple(r) for r in idx.probe(q, n_probe=4, k=10).collect()
        }  # bounded: 80 rows
        t0 = time.time()
        mapping = idx.compact()
        t_compact = time.time() - t0
        meta2 = idx._read_meta()
        after_files = sum(len(v) for v in meta2["files"].values())
        after = {
            tuple(r) for r in idx.probe(q, n_probe=4, k=10).collect()
        }
        assert after == before, "compaction changed probe results"
        total = sum(idx.list_counts().values())
        print(
            f"compact: {frag_lists} fragmented lists / {frag_files} files "
            f"-> {len(mapping)} rewritten, {after_files} files "
            f"({total:,} vectors), {t_compact:.1f}s; probe bit-equal "
            "before/after"
        )

    spark.stop()


if __name__ == "__main__":
    main()
