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
