#!/usr/bin/env python
"""Scale probe for distributed BPE training (SCALE_NOTES §18 claim:
iterations are VOCABULARY-bound, not corpus-bound): a synthetic corpus
with 50,000 distinct words (built executor-side — each word a base-26
rendering of a deterministic integer, lengths 4-8) under two corpus
multiplicities. If the claim holds, total fit time is flat in corpus
size once the (word, freq) table exists, and grows with vocabulary.

Prints one JSON line; numbers recorded in SCALE_NOTES §18.

Run: python examples/bpe_scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from reflex_spark.operators.text import bpe_fit
from reflex_spark.session import get_spark


def corpus(spark, n_rows: int, vocab: int):
    """One pseudo-word per row; vocabulary size ``vocab``; built fully
    executor-side (base-26 digits via integer arithmetic)."""
    wid = F.col("id") % vocab
    ln = (wid % 5 + 4).cast("int")  # word length 4..8
    word = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(1), ln),
            lambda i: F.chr(
                F.lit(97)
                + (
                    (wid * 31 + i.cast("long") * 17) % 26
                ).cast("int")
            ),
        ),
    )
    return spark.range(n_rows).select(word.alias("text"))


def main() -> None:
    spark = get_spark(app_name="bpe_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # untimed warmup: JIT + codegen so the first timed entry isn't charged
    bpe_fit(corpus(spark, 10_000, 1_000), "text", n_merges=2)[0].collect()
    out = {}
    for label, rows, vocab in (
        ("50k_vocab_1x", 200_000, 50_000),
        ("50k_vocab_10x", 2_000_000, 50_000),
        ("5k_vocab_1x", 200_000, 5_000),
    ):
        df = corpus(spark, rows, vocab)
        t0 = time.time()
        merges, vocab_df = bpe_fit(df, "text", n_merges=8)
        got = merges.collect()
        wall = time.time() - t0
        out[label] = {
            "rows": rows,
            "vocab": vocab,
            "fit_wall_sec": round(wall, 2),
            "first_merge": f"{got[0]['left_sym']}+{got[0]['right_sym']}",
            "n_merges": len(got),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
