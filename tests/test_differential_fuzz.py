"""Property-based differential fuzzing: RANDOMLY GENERATED relational
queries built simultaneously as a Spark DataFrame plan and a DuckDB SQL
string, compared through the same normalizer as the driver gate.

The catalog tests pin ~150 hand-written queries; this suite guards the
space BETWEEN them — filter/aggregate/group-by combinations nobody wrote by
hand — so a systematic divergence (null ordering, date comparison, decimal
rounding, three-valued logic under OR) can't hide in an untested corner."""

import os

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelines_spark.sources.parquet import load_table
from datapipelines_spark.testing import (
    duckdb_connection,
    duckdb_result,
    normalize_rows,
    spark_result,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

# --- predicate atoms: (build_spark_column, sql_text) pairs --------------------

_DATES = ("1993-03-15", "1994-12-01", "1995-06-17", "1997-01-01")
_FLAGS = ("R", "A", "N")
_STATUS = ("O", "F")


def _atom_qty(v):
    return (lambda: F.col("l_quantity") < v, f"l_quantity < {v}")


def _atom_flag(flag):
    return (lambda: F.col("l_returnflag") == flag, f"l_returnflag = '{flag}'")


def _atom_status(s):
    return (lambda: F.col("l_linestatus") != s, f"l_linestatus <> '{s}'")


def _atom_date(d):
    return (
        lambda: F.col("l_shipdate") < F.lit(d).cast("date"),
        f"l_shipdate < DATE '{d}'",
    )


def _atom_disc(lo, hi):
    return (
        lambda: F.col("l_discount").between(lo, hi),
        f"l_discount BETWEEN {lo} AND {hi}",
    )


def _atom_null_or(v):
    # exercises three-valued logic: NULL-free column but OR with a false arm
    return (
        lambda: (F.col("l_tax") > 9.0) | (F.col("l_partkey") % 7 == v),
        f"(l_tax > 9.0 OR l_partkey % 7 = {v})",
    )


atoms = st.one_of(
    st.integers(1, 50).map(_atom_qty),
    st.sampled_from(_FLAGS).map(_atom_flag),
    st.sampled_from(_STATUS).map(_atom_status),
    st.sampled_from(_DATES).map(_atom_date),
    st.tuples(
        st.sampled_from([0.0, 0.02, 0.05]), st.sampled_from([0.06, 0.08, 0.1])
    ).map(lambda t: _atom_disc(*t)),
    st.integers(0, 6).map(_atom_null_or),
)


@st.composite
def predicates(draw):
    """1-3 atoms combined with AND/OR (left-assoc, parenthesized in SQL)."""
    parts = draw(st.lists(atoms, min_size=1, max_size=3))
    ops = draw(
        st.lists(st.sampled_from(["AND", "OR"]), min_size=len(parts) - 1,
                 max_size=len(parts) - 1)
    )
    def build():
        col = parts[0][0]()
        for op, p in zip(ops, parts[1:]):
            col = (col & p[0]()) if op == "AND" else (col | p[0]())
        return col
    sql = parts[0][1]
    for op, p in zip(ops, parts[1:]):
        sql = f"({sql} {op} {p[1]})"
    return build, sql


# --- aggregate menu -----------------------------------------------------------

AGGS = {
    "n_rows": (
        lambda: F.count(F.lit(1)).alias("n_rows"),
        "CAST(COUNT(*) AS BIGINT) AS n_rows",
    ),
    "sum_qty": (
        lambda: F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty",
    ),
    "n_parts": (
        lambda: F.countDistinct("l_partkey").alias("n_parts"),
        "CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts",
    ),
    "min_ship": (
        lambda: F.min("l_shipdate").alias("min_ship"),
        "MIN(l_shipdate) AS min_ship",
    ),
    "max_price": (
        lambda: F.max(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("max_price"),
        "CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price",
    ),
}

GROUP_SETS = [(), ("l_returnflag",), ("l_returnflag", "l_linestatus")]


@pytest.fixture(scope="module")
def ctx(spark):
    con = duckdb_connection(SF_DIR)
    li = load_table(spark, SF_DIR, "lineitem")
    yield spark, con, li
    con.close()


@settings(max_examples=60, deadline=None)
@given(
    pred=predicates(),
    agg_names=st.lists(
        st.sampled_from(sorted(AGGS)), min_size=1, max_size=3, unique=True
    ),
    groups=st.sampled_from(GROUP_SETS),
)
def test_random_query_matches_duckdb(ctx, pred, agg_names, groups):
    spark, con, li = ctx
    build_pred, pred_sql = pred
    aggs_spark = [AGGS[a][0]() for a in sorted(agg_names)]
    aggs_sql = ", ".join(AGGS[a][1] for a in sorted(agg_names))

    filtered = li.where(build_pred())
    if groups:
        df = filtered.groupBy(*groups).agg(*aggs_spark)
        sql = (
            f"SELECT {', '.join(groups)}, {aggs_sql} FROM lineitem "
            f"WHERE {pred_sql} GROUP BY {', '.join(groups)}"
        )
    else:
        df = filtered.agg(*aggs_spark)
        sql = f"SELECT {aggs_sql} FROM lineitem WHERE {pred_sql}"

    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duckdb_result(con, sql)
    assert sorted(s_cols) == sorted(d_cols)
    assert normalize_rows(s_cols, s_rows) == normalize_rows(d_cols, d_rows), sql
