"""Single-pass constraint checking (operators/checks.py)."""

import pytest

from datapipelines_spark.operators.checks import (
    accepted_values,
    bounds,
    check_constraints,
    completeness,
    uniqueness,
)


def _results(df, cs):
    return {
        (r["constraint"], r["column"]): (r["observed"], r["passed"])
        for r in check_constraints(df, cs).collect()
    }


def test_all_constraint_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0),
            (2, "F", -5.0),   # bounds violation
            (3, "X", 20.0),   # accepted_values violation
            (3, None, 30.0),  # duplicate key + null status
        ],
        "k long, status string, price double",
    )
    got = _results(
        df,
        [
            completeness("status", 1.0),
            uniqueness("k"),
            bounds("price", 0, 100),
            accepted_values("status", ["O", "F"]),
        ],
    )
    assert got[("completeness", "status")] == (0.75, False)
    assert got[("uniqueness", "k")] == (3.0, False)
    assert got[("bounds", "price")] == (1.0, False)
    assert got[("accepted_values", "status")] == (1.0, False)


def test_clean_table_passes(spark):
    df = spark.createDataFrame(
        [(1, "O", 10.0), (2, "F", 20.0)], "k long, status string, price double"
    )
    got = _results(
        df,
        [
            completeness("status"),
            uniqueness("k"),
            bounds("price", 0, 100),
            accepted_values("status", ["O", "F"]),
        ],
    )
    assert all(passed for _, passed in got.values())


def test_single_scan_plan(spark):
    """Every constraint rides ONE aggregate: exactly one scan of the input
    in the physical plan."""
    df = spark.range(100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS price")
    out = check_constraints(
        df, [completeness("k"), bounds("price", 0, 1000), uniqueness("k")]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1


def test_empty_constraints_rejected(spark):
    with pytest.raises(ValueError):
        check_constraints(spark.range(1), [])


def test_profile_table_metrics(spark):
    from datapipelines_spark.operators.checks import profile_table

    df = spark.createDataFrame(
        [(1.0, "aa"), (3.0, "b"), (None, "cccc"), (2.0, None)],
        "x double, s string",
    )
    got = {
        (r["column"], r["metric"]): r["value"]
        for r in profile_table(df, ["x"], ["s"]).collect()
    }
    assert got[("x", "n_null")] == 1.0
    assert got[("x", "n_distinct")] == 3.0
    assert got[("x", "min")] == 1.0 and got[("x", "max")] == 3.0
    assert got[("x", "mean")] == 2.0
    assert got[("x", "median")] == 2.0
    assert got[("s", "n_null")] == 1.0
    assert got[("s", "min_len")] == 1.0 and got[("s", "max_len")] == 4.0
    assert got[("s", "avg_len")] == pytest.approx(7 / 3, abs=1e-6)


def test_profile_table_single_scan(spark):
    from datapipelines_spark.operators.checks import profile_table

    df = spark.range(50).selectExpr("CAST(id AS DOUBLE) AS x", "CAST(id AS STRING) AS s")
    plan = (
        profile_table(df, ["x"], ["s"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Range (0, 50") == 1


def test_profile_table_rejects_empty_spec(spark):
    from datapipelines_spark.operators.checks import profile_table

    with pytest.raises(ValueError):
        profile_table(spark.range(1))
