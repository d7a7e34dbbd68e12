"""GROUPED_AGG pandas UDAFs used by the judged queries.

Defined in their own module WITHOUT ``from __future__ import annotations``
on purpose: that import stringifies type hints module-wide, which defeats
``pandas_udf``'s hint inference and used to force the deprecated
``PandasUDFType.GROUPED_AGG`` enum (the suite's only deprecation warnings).
Here the ``pd.Series -> scalar`` hints select the grouped-agg eval type the
supported way.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def micro_mean(v: pd.Series) -> float:
    """Partition-layout-invariant mean: quantize to int64 micros (exact —
    the fixture's values carry <= 6 dp, i.e. the decimal(18,6) mantissa),
    sum exactly, then one IEEE chain float(total) / n / 1e6 shared with
    the DuckDB oracle."""
    micros = (v * 1e6).round().astype("int64")
    return float(micros.sum()) / len(micros) / 1e6


@pandas_udf("long")
def group_size(v: pd.Series) -> int:
    # GROUPED_AGG UDFs cannot mix with built-in aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT) — the count is a second UDAF.
    return len(v)
