"""Every judged query must match its DuckDB oracle bit-exactly (sf0.001).

This is the local replica of the driver's correctness gate. A second,
slower marker runs the same at sf0.01 (the driver's actual SF).
"""

from __future__ import annotations

import os

import pytest

from reflex_spark.queries import all_oracle_sql, all_queries
from tests.conftest import SF_MEDIUM, SF_SMALL
from tests.oracle_harness import compare, run_oracle

QUERIES = all_queries()
ORACLE = all_oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle_sf0001(spark, name):
    errs = compare(QUERIES[name](spark, SF_SMALL), run_oracle(ORACLE[name], SF_SMALL), name)
    assert not errs, "\n".join(errs)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle_sf001(spark, name):
    errs = compare(QUERIES[name](spark, SF_MEDIUM), run_oracle(ORACLE[name], SF_MEDIUM), name)
    assert not errs, "\n".join(errs)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, name):
    """Queries without an oracle still must run and have a stable schema."""
    df = QUERIES[name](spark, SF_SMALL)
    assert df.columns
    assert df.count() >= 0


def test_compare_rejects_int_vs_float_dtypes(spark):
    """The local gate must be at least as strict as the driver's value-hash:
    an integral Spark column vs a float oracle column (e.g. DuckDB HUGEINT →
    pandas float64) is a failure even when the values are numerically equal.
    Regression for the round-5 text_sequence_packing escape."""
    import pandas as pd

    sdf = spark.createDataFrame([(1, "a"), (2, "b")], ["pack_id", "k"])
    opdf = pd.DataFrame({"pack_id": [1.0, 2.0], "k": ["a", "b"]})
    errs = compare(sdf, opdf, "dtype_guard")
    assert errs and "dtype family mismatch" in errs[0]
    # and identical dtypes still pass
    ok = pd.DataFrame({"pack_id": [1, 2], "k": ["a", "b"]})
    assert not compare(sdf, ok, "dtype_guard_ok")


def test_entry_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
