"""Steady-state GOVERNED ANN maintenance at scale: the append+compact
cadence loop (the shape ``stream_ann_index_compaction_rollup`` judges
at fixture SF) measured at millions of vectors.

The claim under test is the steady-state cost model the operator
docstrings assert:

- per-batch ``append`` stays O(batch) as the index grows — the wall
  time of batch 16 must not drift above batch 1's, and the ledger
  read-back must stay O(touched partitions) through every id
  remapping a cadence pass performs;
- each cadence ``compact()`` is O(fragmented bytes) = O(CADENCE recent
  batches), never O(corpus) — pass wall times must be flat across the
  run while the corpus triples;
- fragmentation and metadata stay BOUNDED: list file counts return to
  one per list on cadence (peaking at CADENCE+1), the ledger's
  file-name total never exceeds lists x (CADENCE+1), and the garbage
  list holds at most one maintenance interval's parked state.

Vectors are synthesized JVM-side (deterministic trig of the id — no
Python row generation) in 8 dims so the timings isolate the
maintenance machinery rather than vector math, matching
``ivf_maintenance_scale.py``.

Run:  python examples/ivf_streaming_cadence_scale.py  [n_vectors]
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
BATCHES = 16
CADENCE = 4


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    spark = get_spark(app_name="ivf_streaming_cadence_scale")
    spark.sparkContext.setLogLevel("ERROR")

    def vecs(lo: int, hi: int):
        base = spark.range(lo, hi).select(F.col("id").alias("vec_id"))
        # constant first component: avoids the all-zero rounding corner
        # a pure-trig vector hits at scale (see ivf_maintenance_scale)
        comps = [F.lit(1.0)] + [
            F.round(F.sin((F.col("vec_id") + 1) * F.lit(0.1 * (d + 1))), 6)
            for d in range(DIMS - 1)
        ]
        return base.select("vec_id", F.array(*comps).alias("embedding"))

    cent = vecs(0, N_LISTS).select(
        F.col("vec_id").cast("int").alias("list_id"),
        F.col("embedding").alias("centroid"),
    )

    seed_n = n // 3
    batch_sz = (n - seed_n) // BATCHES

    with tempfile.TemporaryDirectory(prefix="ivf_cadence_") as base:
        t0 = time.time()
        idx = IvfIndex.build(spark, f"{base}/idx", vecs(0, seed_n), cent)
        print(
            f"build: {seed_n:,} vectors, "
            f"{sum(len(v) for v in idx._read_meta()['files'].values())} "
            f"files, {time.time() - t0:.1f}s"
        )

        append_t: list[float] = []
        compact_t: list[float] = []
        peak_files = 0
        for i in range(1, BATCHES + 1):
            lo = seed_n + (i - 1) * batch_sz
            hi = seed_n + i * batch_sz if i < BATCHES else n
            t0 = time.time()
            idx.append(vecs(lo, hi))
            append_t.append(time.time() - t0)
            rb = idx.last_append_readback
            meta = idx._read_meta()
            total_files = sum(len(v) for v in meta["files"].values())
            peak_files = max(peak_files, total_files)
            line = (
                f"batch {i:2d}: +{hi - lo:,} in {append_t[-1]:5.1f}s | "
                f"readback {rb['dirs_listed']} dirs / {rb['files_read']} "
                f"files | ledger {total_files} files"
            )
            if i % CADENCE == 0:
                t0 = time.time()
                mapping = idx.compact()
                compact_t.append(time.time() - t0)
                meta = idx._read_meta()
                total_after = sum(len(v) for v in meta["files"].values())
                assert all(
                    len(v) == 1 for v in meta["files"].values()
                ), "cadence pass left fragments"
                assert len(meta.get("garbage", [])) == len(mapping) + 1, (
                    "garbage not bounded to one interval"
                )
                line += (
                    f" || compact: {len(mapping)} lists -> "
                    f"{total_after} files, {compact_t[-1]:.1f}s"
                )
            print(line)

        half = BATCHES // 2
        corpus = sum(idx.list_counts().values())
        assert corpus == n, f"corpus drifted: {corpus:,} != {n:,}"
        print(
            f"\nsummary @ {n:,} vectors, {BATCHES} batches, "
            f"cadence {CADENCE}:\n"
            f"  append s/batch: first half "
            f"{sum(append_t[:half]) / half:.1f}, second half "
            f"{sum(append_t[half:]) / (BATCHES - half):.1f} "
            f"(flat = O(batch) holds while corpus grew "
            f"{seed_n:,} -> {n:,})\n"
            f"  compact s/pass: "
            f"{', '.join(f'{t:.1f}' for t in compact_t)} "
            f"(flat = O(interval), never O(corpus))\n"
            f"  peak ledger files {peak_files} "
            f"(bound: {N_LISTS} lists x (CADENCE+1) = "
            f"{N_LISTS * (CADENCE + 1)})"
        )

        q = vecs(0, 8).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
        )
        t0 = time.time()
        rows = idx.probe(q, n_probe=4, k=10, eager=True).count()
        print(f"  final eager probe: {rows} rows, {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
