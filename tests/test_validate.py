"""operators/validate: single-pass declarative data-quality expectations."""

from __future__ import annotations

import pytest

from reflex_spark.operators import validate as V


def _report(spark, df, exps):
    rows = V.validate(df, exps).collect()
    return {r["check_name"]: (r["metric_value"], r["passed"]) for r in rows}


def test_validate_metrics_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, None, 30.0), (3, "b", None)],
        "id long, tag string, v double",
    )
    rep = _report(
        spark,
        df,
        [
            V.is_complete("tag"),          # 3/4 < 1.0 -> fail
            V.is_complete("id"),           # 4/4 -> pass
            V.is_unique("id"),             # 3/4 < 1.0 -> fail
            V.has_min("v", lo=0.0),        # 10.0 -> pass
            V.has_max("v", hi=25.0),       # 30.0 -> fail
            V.has_mean("v", lo=15.0, hi=25.0),  # 20.0 -> pass
            V.in_set_ratio("tag", ["a", "b"], at_least=1.0),  # null row -> 0.75, fail
            V.matches_ratio("tag", "^a$", at_least=0.5),      # 0.5 -> pass
            V.has_size(lo=4.0, hi=4.0),
        ],
    )
    assert rep["complete(tag)"] == (0.75, 0)
    assert rep["complete(id)"] == (1.0, 1)
    assert rep["unique(id)"] == (0.75, 0)
    assert rep["min(v)"] == (10.0, 1)
    assert rep["max(v)"] == (30.0, 0)
    assert rep["mean(v)"] == (20.0, 1)
    assert rep["in_set(tag)"] == (0.75, 0)
    assert rep["matches(tag)"] == (0.5, 1)
    assert rep["size()"] == (4.0, 1)


def test_validate_is_one_pass(spark):
    """The whole suite must be ONE aggregation over one scan of the input —
    adding expectations adds aggregate expressions, never passes."""
    df = spark.range(100).selectExpr("id", "cast(id % 7 as string) AS tag")
    plan = V.validate(
        df,
        [V.is_complete("tag"), V.has_min("id", lo=0.0), V.has_size(lo=1.0)],
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1


def test_validate_unbounded_expectation_always_passes(spark):
    df = spark.range(10)
    rep = _report(spark, df, [V.has_min("id")])
    assert rep["min(id)"] == (0.0, 1)


def test_validate_empty_expectations_raises(spark):
    with pytest.raises(ValueError):
        V.validate(spark.range(1), [])


def test_approx_unique_has_no_sql_twin_and_works(spark):
    df = spark.range(1000)
    e = V.is_unique("id", approx=True)
    assert e.sql_metric is None
    with pytest.raises(ValueError):
        V.sql_validate("t", [e])
    (m, passed), = _report(spark, df, [e]).values()
    # HLL relative error default ~5%; the bound only pins plumbing here
    assert 0.9 <= m <= 1.1


def test_sql_validate_matches_spark_on_fixture(spark):
    """The generated oracle and the Spark plan agree bit-exactly (the
    drift-proofing the generator exists for)."""
    from tests.conftest import SF_SMALL
    from tests.oracle_harness import compare, run_oracle

    exps = [
        V.is_complete("o_custkey"),
        V.is_unique("o_orderkey"),
        V.has_mean("o_totalprice", lo=0.0),
        V.in_set_ratio("o_orderstatus", ["F", "O", "P"], at_least=1.0),
        V.matches_ratio("o_orderpriority", "^[1-5]-", at_least=1.0),
    ]
    df = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    errs = compare(
        V.validate(df, exps),
        run_oracle(V.sql_validate("orders", exps), SF_SMALL),
        "validate_generated_oracle",
    )
    assert errs == []


def test_validate_empty_and_all_null_fail_closed(spark):
    """ANSI-mode regression: ratios/means on an empty frame or all-NULL
    column must yield a NULL metric and passed=0 — never DIVIDE_BY_ZERO."""
    empty = spark.createDataFrame([], "id long, v double")
    rep = _report(spark, empty, [V.is_complete("v"), V.has_mean("v", lo=0.0)])
    assert rep["complete(v)"] == (None, 0)
    assert rep["mean(v)"] == (None, 0)
    allnull = spark.createDataFrame([(1, None), (2, None)], "id long, v double")
    rep = _report(spark, allnull, [V.has_mean("v", lo=0.0)])
    assert rep["mean(v)"] == (None, 0)


def test_sql_twin_matches_on_empty_selection(spark):
    """DuckDB x/0 -> NULL == Spark try_divide -> NULL; COALESCE(...,FALSE)
    keeps the passed bit identical too."""
    from tests.conftest import SF_SMALL
    from tests.oracle_harness import compare, run_oracle

    exps = [V.is_complete("o_custkey"), V.has_mean("o_totalprice", lo=0.0)]
    df = spark.read.parquet(f"{SF_SMALL}/orders.parquet").where("o_orderkey < 0")
    errs = compare(
        V.validate(df, exps),
        run_oracle(
            V.sql_validate("(SELECT * FROM orders WHERE o_orderkey < 0)", exps),
            SF_SMALL,
        ),
        "validate_empty_parity",
    )
    assert errs == []


def test_generated_oracle_parity_random_expectations(spark):
    """Property: for RANDOM expectation suites over the orders fixture,
    the Spark report and the generated DuckDB oracle agree bit-exactly —
    the drift-proofing claim, tested beyond the hand-picked cases."""
    import random

    from tests.conftest import SF_SMALL
    from tests.oracle_harness import compare, run_oracle

    rng = random.Random(13)
    df = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    makers = [
        lambda r: V.is_complete("o_custkey", at_least=r.choice([0.5, 1.0])),
        lambda r: V.is_unique("o_orderkey", at_least=r.choice([0.9, 1.0])),
        lambda r: V.has_min("o_totalprice", lo=r.choice([None, 0.0, 2000.0])),
        lambda r: V.has_max("o_totalprice", hi=r.choice([None, 1e5, 1e7])),
        lambda r: V.has_mean(
            "o_totalprice", lo=r.choice([None, 0.0]), hi=r.choice([None, 3e5])
        ),
        lambda r: V.in_set_ratio(
            "o_orderstatus",
            r.sample(["F", "O", "P"], r.randint(1, 3)),
            at_least=r.choice([0.3, 1.0]),
        ),
        lambda r: V.matches_ratio(
            "o_orderpriority", r.choice(["^[1-3]-", "URGENT$"]),
            at_least=r.choice([0.1, 0.9]),
        ),
        lambda r: V.has_size(lo=r.choice([None, 1.0]), hi=r.choice([None, 1e9])),
    ]
    for trial in range(6):
        exps = [m(rng) for m in rng.sample(makers, rng.randint(2, len(makers)))]
        errs = compare(
            V.validate(df, exps),
            run_oracle(V.sql_validate("orders", exps), SF_SMALL),
            f"validate_random_{trial}",
        )
        assert errs == [], errs


def test_quoted_values_and_patterns_survive_sql_generation(spark):
    """in_set values / rlike patterns containing single quotes must be
    SQL-escaped in the generated oracle, not break it or diverge from
    the Spark side."""
    import duckdb

    df = spark.createDataFrame(
        [("o'brien",), ("smith",), ("o'brien",), ("d'arcy",)], "name string"
    )
    exps = [
        V.in_set_ratio("name", ["o'brien", "smith"], at_least=0.7),
        V.matches_ratio("name", "^[a-z]+'?[a-z]+$", at_least=0.9),
    ]
    got = {
        r["check_name"]: (r["metric_value"], r["passed"])
        for r in V.validate(df, exps).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(V.sql_validate("t", exps)).fetchall()
    }
    assert got == oracle
    assert got["in_set(name)"] == (0.75, 1)
    assert got["matches(name)"] == (1.0, 1)
