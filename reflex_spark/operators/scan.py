"""Two-phase bucketed prefix scan: running (cumulative) aggregation over a
global order WITHOUT a single-partition window.

``Window.orderBy(...)`` with no partition moves every row to one task —
the documented caveat in the statistics family (CUSUM, running distinct).
This operator is the promised upgrade path, the classic parallel-scan
decomposition:

- **phase 1** — range-bucket rows on a numeric key (approx-quantile
  boundaries: balance only; correctness never depends on where the cuts
  land, because any boundary set partitions the key space into contiguous
  ranges), then compute each bucket's INTERNAL running sum with an
  ordinary per-bucket window — all buckets in parallel;
- **phase 2** — aggregate one total per bucket (``num_buckets`` rows,
  control-plane sized), turn them into exclusive offsets with a window
  over that tiny frame, and broadcast-join the offsets back:
  ``running = bucket_offset + within-bucket prefix``.

Exactness contract: the summed expression must be associative-exact
(integer or decimal) — the same rule every judged running sum already
follows — so bucket boundaries, task order, and bucket count can never
move the result. A float input would be order-sensitive in ANY
implementation, including the single-partition one.

Scale: wall-clock is dominated by the per-bucket windows (parallel, one
shuffle by range) plus one broadcast of ``num_buckets × |partition_by
groups|`` offset rows. At 100 TB you raise ``num_buckets`` to the
cluster's task budget; the single-partition form is the degenerate
``num_buckets=1``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "__psb"
_PARTIAL = "__psp"
_OFFSET = "__pso"


def bucketed_prefix_sum(
    df: DataFrame,
    order_by: list,
    bucket_key: str,
    value: Column,
    out_col: str,
    num_buckets: int = 32,
    partition_by: list | None = None,
) -> DataFrame:
    """Add ``out_col`` = inclusive running sum of ``value`` in ``order_by``
    order (per ``partition_by`` group if given), computed with the
    two-phase bucketed scan above.

    - ``order_by``: columns forming a TOTAL order (include a unique
      tie-break — same requirement as any deterministic running sum).
    - ``bucket_key``: a non-null numeric column monotone in the order's
      leading key (usually the leading key itself); used only to place
      range-bucket boundaries.
    - ``value``: an associative-exact expression (integer or decimal).
    """
    part = list(partition_by or [])
    probes = [i / num_buckets for i in range(1, num_buckets)]
    # Approx boundaries: accuracy only shifts bucket BALANCE, never results.
    bounds = (
        sorted(set(df.stat.approxQuantile(bucket_key, probes, 0.001)))
        if probes
        else []
    )
    if bounds:
        lits = ", ".join(f"CAST({b!r} AS DOUBLE)" for b in bounds)
        bucket = F.expr(
            f"size(filter(array({lits}), b -> b <= CAST({bucket_key} AS DOUBLE)))"
        )
    else:  # empty frame or single-value key: one bucket
        bucket = F.lit(0)
    with_b = df.withColumn(_BUCKET, bucket)

    w_in = (
        Window.partitionBy(*(part + [_BUCKET]))
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    partial = with_b.withColumn(_PARTIAL, F.sum(value).over(w_in))

    totals = with_b.groupBy(*(part + [_BUCKET])).agg(F.sum(value).alias("__t"))
    w_off = (
        Window.partitionBy(*part)
        .orderBy(_BUCKET)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *(part + [_BUCKET]), F.sum("__t").over(w_off).alias(_OFFSET)
    )

    out = (
        partial.join(F.broadcast(offsets), part + [_BUCKET], "left")
        .withColumn(
            out_col, F.col(_PARTIAL) + F.coalesce(F.col(_OFFSET), F.lit(0))
        )
        .drop(_BUCKET, _PARTIAL, _OFFSET)
    )
    return out
