"""Find-then-verify heavy hitters (operators/sketch.py): exactness against
a brute-force groupBy, candidate-superset behavior, edge cases."""

import pyspark.sql.functions as F
import pytest

from datapipelines_spark.operators.sketch import heavy_hitters


def _tokens(spark, counts: dict[str, int]):
    rows = [(w,) for w, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "token string")


def test_matches_bruteforce_exactly(spark):
    counts = {"a": 500, "b": 120, "c": 11, "d": 9, "e": 360}
    df = _tokens(spark, counts)  # total 1000; support 1% -> threshold 10
    got = {
        r["item"]: (r["n"], r["share"])
        for r in heavy_hitters(df, "token", support=0.01).collect()
    }
    expect = {
        w: (n, round(n / 1000, 6)) for w, n in counts.items() if n > 10
    }
    assert got == expect  # 'c' (11) in, 'd' (9) out


def test_boundary_is_strictly_greater(spark):
    df = _tokens(spark, {"x": 10, "y": 990})  # x is exactly 1%
    got = {r["item"] for r in heavy_hitters(df, "token", support=0.01).collect()}
    assert got == {"y"}


def test_no_heavy_hitters_returns_empty(spark):
    df = spark.range(2000).select(
        F.concat(F.lit("t"), F.col("id")).alias("token")
    )  # all unique: nothing above 1%
    assert heavy_hitters(df, "token", support=0.01).count() == 0


def test_invalid_support_rejected(spark):
    df = _tokens(spark, {"a": 1})
    with pytest.raises(ValueError):
        heavy_hitters(df, "token", support=1e-6)


def test_nulls_ignored_as_candidates(spark):
    df = spark.createDataFrame(
        [("a",)] * 50 + [(None,)] * 50, "token string"
    )
    got = {r["item"]: r["n"] for r in heavy_hitters(df, "token", 0.2).collect()}
    assert got == {"a": 50}


def test_empty_branch_schema_matches_nonempty(spark):
    """ADVICE r6 #2: the empty-candidate branch must carry the INPUT
    column's type for `item`, so both branches union/write cleanly."""
    longs = spark.range(3000).select(F.col("id").alias("user"))  # all unique
    empty = heavy_hitters(longs, "user", support=0.01)
    assert empty.count() == 0
    hot = spark.createDataFrame([(7,)] * 90 + [(i,) for i in range(10)], "user long")
    nonempty = heavy_hitters(hot, "user", support=0.5)
    assert [f.dataType for f in empty.schema.fields] == [
        f.dataType for f in nonempty.schema.fields
    ]
    assert empty.unionByName(nonempty).count() == nonempty.count()
