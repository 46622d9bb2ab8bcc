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
from hypothesis import assume, given, settings
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


# --- join fuzzing (VERDICT r5 #7): the semantic surface the catalog pins ------
# only pointwise. Random join TYPE x per-side predicates over
# orders |X| customer, aggregated to a small deterministic result. Predicates
# apply BEFORE the join on both engines (subqueries in SQL), mirroring the
# filtered-then-joined DataFrames.

_SEGMENTS = ("BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE")
_OSTATUS = ("O", "F", "P")

_JOIN_TYPES = {
    "inner": "JOIN",
    "left": "LEFT JOIN",
    "right": "RIGHT JOIN",
    "full": "FULL JOIN",
}


def _opred(kind, v):
    if kind == "price":
        return (lambda: F.col("o_totalprice") < v, f"o_totalprice < {v}")
    if kind == "status":
        s = _OSTATUS[v % len(_OSTATUS)]
        return (lambda: F.col("o_orderstatus") == s, f"o_orderstatus = '{s}'")
    d = _DATES[v % len(_DATES)]
    return (
        lambda: F.col("o_orderdate") < F.lit(d).cast("date"),
        f"o_orderdate < DATE '{d}'",
    )


def _cpred(kind, v):
    if kind == "bal":
        return (lambda: F.col("c_acctbal") > v, f"c_acctbal > {v}")
    seg = _SEGMENTS[v % len(_SEGMENTS)]
    return (lambda: F.col("c_mktsegment") == seg, f"c_mktsegment = '{seg}'")


opreds = st.one_of(
    st.integers(20_000, 200_000).map(lambda v: _opred("price", v)),
    st.integers(0, 2).map(lambda v: _opred("status", v)),
    st.integers(0, 3).map(lambda v: _opred("date", v)),
)
cpreds = st.one_of(
    st.integers(-500, 5000).map(lambda v: _cpred("bal", v)),
    st.integers(0, 4).map(lambda v: _cpred("seg", v)),
)


@pytest.fixture(scope="module")
def join_ctx(spark):
    con = duckdb_connection(SF_DIR)
    yield spark, con, load_table(spark, SF_DIR, "orders"), load_table(
        spark, SF_DIR, "customer"
    )
    con.close()


@settings(max_examples=40, deadline=None)
@given(
    how=st.sampled_from(sorted(_JOIN_TYPES) + ["left_semi", "left_anti"]),
    op=opreds,
    cp=cpreds,
)
def test_random_join_matches_duckdb(join_ctx, how, op, cp):
    spark, con, orders, customer = join_ctx
    o_build, o_sql = op
    c_build, c_sql = cp
    o = orders.where(o_build())
    c = customer.where(c_build())
    joined = o.join(c, o.o_custkey == c.c_custkey, how)
    if how in ("left_semi", "left_anti"):
        # only left columns survive: aggregate over orders
        df = joined.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("o_custkey").alias("n_cust"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        exists = "NOT EXISTS" if how == "left_anti" else "EXISTS"
        sql = f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price
        FROM orders o
        WHERE {o_sql} AND {exists} (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
               AND {c_sql})
        """
    else:
        # count both sides' keys: outer joins emit NULLs the COUNTs must
        # skip identically on both engines
        df = joined.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderkey").alias("n_orders"),
            F.count("c_custkey").alias("n_cust_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_bal"),
        )
        sql = f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
               CAST(COUNT(c_custkey) AS BIGINT) AS n_cust_rows,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM (SELECT * FROM orders WHERE {o_sql}) o
        {_JOIN_TYPES[how]} (SELECT * FROM customer WHERE {c_sql}) c
          ON o.o_custkey = c.c_custkey
        """
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duckdb_result(con, sql)
    assert sorted(s_cols) == sorted(d_cols)
    assert normalize_rows(s_cols, s_rows) == normalize_rows(d_cols, d_rows), sql


# --- window-frame fuzzing: random partition x order x ROWS frame x function ---
# Every ordering includes the unique (l_orderkey, l_linenumber) tiebreak so
# ROWS frames are deterministic under ties; rank functions depend only on the
# order spec. Row-level outputs compared in full at sf0.001.

_PARTS = [("l_returnflag",), ("l_linestatus",), ("l_returnflag", "l_linestatus")]
_ORDERS = ["l_shipdate", "l_extendedprice", "l_quantity"]
_STARTS = [None, -3, -1, 0]  # None = UNBOUNDED PRECEDING
_ENDS = [0, 1, 3, None]  # None = UNBOUNDED FOLLOWING


def _frame_sql(start, end):
    lo = "UNBOUNDED PRECEDING" if start is None else (
        "CURRENT ROW" if start == 0 else f"{-start} PRECEDING"
    )
    hi = "UNBOUNDED FOLLOWING" if end is None else (
        "CURRENT ROW" if end == 0 else f"{end} FOLLOWING"
    )
    return f"ROWS BETWEEN {lo} AND {hi}"


@settings(max_examples=40, deadline=None)
@given(
    part=st.sampled_from(_PARTS),
    order=st.sampled_from(_ORDERS),
    start=st.sampled_from(_STARTS),
    end=st.sampled_from(_ENDS),
    fn=st.sampled_from(["sum", "count", "min", "max", "rank", "dense_rank",
                        "row_number", "lag"]),
)
def test_random_window_frame_matches_duckdb(ctx, part, order, start, end, fn):
    from pyspark.sql import Window

    spark, con, li = ctx
    order_cols = [order, "l_orderkey", "l_linenumber"]
    win = Window.partitionBy(*part).orderBy(*order_cols)
    frame_sql = ""
    if fn in ("sum", "count", "min", "max"):
        lo = Window.unboundedPreceding if start is None else start
        hi = Window.unboundedFollowing if end is None else end
        win = win.rowsBetween(lo, hi)
        frame_sql = " " + _frame_sql(start, end)
        val = F.col("l_quantity").cast("decimal(18,2)")
        col = {
            "sum": F.sum(val).over(win).cast("double"),
            "count": F.count(F.lit(1)).over(win),
            "min": F.min(val).over(win).cast("double"),
            "max": F.max(val).over(win).cast("double"),
        }[fn]
        sql_expr = {
            "sum": "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE)",
            "count": "CAST(COUNT(*) OVER w AS BIGINT)",
            "min": "CAST(MIN(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE)",
            "max": "CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE)",
        }[fn]
    elif fn == "lag":
        col = F.lag(F.col("l_quantity").cast("decimal(18,2)"), 2).over(win).cast("double")
        sql_expr = "CAST(LAG(CAST(l_quantity AS DECIMAL(18,2)), 2) OVER w AS DOUBLE)"
    else:
        col = getattr(F, fn)().over(win).cast("long")
        sql_expr = f"CAST({fn.upper()}() OVER w AS BIGINT)"
    df = li.select("l_orderkey", "l_linenumber", col.alias("w_val"))
    sql = f"""
    SELECT l_orderkey, l_linenumber, {sql_expr} AS w_val
    FROM lineitem
    WINDOW w AS (PARTITION BY {', '.join(part)}
                 ORDER BY {', '.join(order_cols)}{frame_sql})
    """
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duckdb_result(con, sql)
    assert sorted(s_cols) == sorted(d_cols)
    assert normalize_rows(s_cols, s_rows) == normalize_rows(d_cols, d_rows), sql


# --- set-operation fuzzing: random setop x per-side predicates ----------------
# Projected to low-cardinality columns so INTERSECT/EXCEPT actually overlap;
# compared as row multisets (GROUP BY all columns + COUNT) so the ALL
# variants' duplicate semantics are pinned too.

_SETOPS = {
    "union": "UNION",
    "unionAll": "UNION ALL",
    "intersect": "INTERSECT",
    "intersectAll": "INTERSECT ALL",
    "exceptAll": "EXCEPT ALL",
    "subtract": "EXCEPT",
}


@settings(max_examples=40, deadline=None)
@given(op=st.sampled_from(sorted(_SETOPS)), pa=predicates(), pb=predicates())
def test_random_setop_matches_duckdb(ctx, op, pa, pb):
    spark, con, li = ctx
    build_a, sql_a = pa
    build_b, sql_b = pb
    proj = ["l_returnflag", "l_linestatus", "qty_band"]
    banded = li.withColumn(
        "qty_band", F.floor(F.col("l_quantity") / 10).cast("int")
    )
    a = banded.where(build_a()).select(*proj)
    b = banded.where(build_b()).select(*proj)
    combined = {
        "union": a.union(b).distinct,
        "unionAll": lambda: a.unionAll(b),
        "intersect": lambda: a.intersect(b),
        "intersectAll": lambda: a.intersectAll(b),
        "exceptAll": lambda: a.exceptAll(b),
        "subtract": lambda: a.subtract(b),
    }[op]()
    df = combined.groupBy(*proj).agg(F.count(F.lit(1)).alias("n"))
    proj_sql = (
        "l_returnflag, l_linestatus, "
        "CAST(floor(l_quantity / 10) AS INT) AS qty_band"
    )
    sql = f"""
    SELECT l_returnflag, l_linestatus, qty_band, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT {proj_sql} FROM lineitem WHERE {sql_a}
        {_SETOPS[op]}
        SELECT {proj_sql} FROM lineitem WHERE {sql_b}
    )
    GROUP BY 1, 2, 3
    """
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duckdb_result(con, sql)
    assert sorted(s_cols) == sorted(d_cols)
    assert normalize_rows(s_cols, s_rows) == normalize_rows(d_cols, d_rows), sql


# --- scalar-expression fuzzing: per-row values keyed by the primary key -------
# Atoms restricted to expressions with identical cross-engine semantics
# (decimal rounding discipline for arithmetic; positive substring offsets).

_SCALARS = {
    # double-typed arithmetic compares via floor(x * 10^k): IEEE multiply +
    # floor are bit-identical across engines, unlike round(double, k) whose
    # half-way behavior differs at representation boundaries (a real
    # cross-engine trap this suite pinned; the catalog's decimal-cast
    # discipline is the production answer)
    "abs_disc": (
        lambda: F.floor(F.abs(F.col("l_discount") - 0.05) * 10000).cast("long"),
        "CAST(floor(abs(l_discount - 0.05) * 10000) AS BIGINT)",
    ),
    "mod7": (
        lambda: F.col("l_partkey") % 7,
        "l_partkey % 7",
    ),
    "concat_flags": (
        lambda: F.concat_ws("|", "l_returnflag", "l_linestatus"),
        "l_returnflag || '|' || l_linestatus",
    ),
    "lower_flag": (
        lambda: F.lower(F.concat("l_returnflag", "l_linestatus")),
        "lower(l_returnflag || l_linestatus)",
    ),
    "year_ship": (
        lambda: F.year("l_shipdate").cast("long"),
        "CAST(year(l_shipdate) AS BIGINT)",
    ),
    "month_ship": (
        lambda: F.month("l_shipdate").cast("long"),
        "CAST(month(l_shipdate) AS BIGINT)",
    ),
    "date_add30": (
        lambda: F.date_add(F.col("l_shipdate"), 30),
        "CAST(l_shipdate AS DATE) + 30",
    ),
    "greatest_nums": (
        lambda: F.floor(
            F.greatest(F.col("l_quantity"), F.col("l_extendedprice") / 1000.0)
            * 100
        ).cast("long"),
        "CAST(floor(greatest(l_quantity, l_extendedprice / 1000.0) * 100)"
        " AS BIGINT)",
    ),
    "case_qty": (
        lambda: F.when(F.col("l_quantity") > 25, "big").otherwise("small"),
        "CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END",
    ),
    "coalesce_null": (
        lambda: F.coalesce(
            F.when(F.col("l_tax") > 9.0, F.col("l_returnflag")), F.lit("none")
        ),
        "COALESCE(CASE WHEN l_tax > 9.0 THEN l_returnflag END, 'none')",
    ),
}


@settings(max_examples=40, deadline=None)
@given(
    names=st.lists(
        st.sampled_from(sorted(_SCALARS)), min_size=1, max_size=4, unique=True
    ),
    pred=predicates(),
)
def test_random_scalar_exprs_match_duckdb(ctx, names, pred):
    spark, con, li = ctx
    build_pred, pred_sql = pred
    cols = [
        _SCALARS[n][0]().alias(f"c_{n}") for n in sorted(names)
    ]
    sqls = ", ".join(f"{_SCALARS[n][1]} AS c_{n}" for n in sorted(names))
    df = li.where(build_pred()).select("l_orderkey", "l_linenumber", *cols)
    sql = (
        f"SELECT l_orderkey, l_linenumber, {sqls} FROM lineitem "
        f"WHERE {pred_sql}"
    )
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duckdb_result(con, sql)
    assert sorted(s_cols) == sorted(d_cols)
    assert normalize_rows(s_cols, s_rows) == normalize_rows(d_cols, d_rows), sql


# --- grouping-extension fuzzing: rollup / cube over random aggregates --------
# Superaggregate rows carry NULL group keys on both engines; GROUPING() is
# included so a NULL key row is distinguishable from a NULL data value.

@settings(max_examples=30, deadline=None)
@given(
    mode=st.sampled_from(["rollup", "cube"]),
    agg_names=st.lists(
        st.sampled_from(sorted(AGGS)), min_size=1, max_size=3, unique=True
    ),
    pred=predicates(),
)
def test_random_rollup_cube_matches_duckdb(ctx, mode, agg_names, pred):
    spark, con, li = ctx
    build_pred, pred_sql = pred
    groups = ["l_returnflag", "l_linestatus"]
    aggs_spark = [AGGS[a][0]() for a in sorted(agg_names)]
    aggs_sql = ", ".join(AGGS[a][1] for a in sorted(agg_names))
    filtered = li.where(build_pred())
    # empty input is a PINNED divergence (test below): Spark emits zero
    # rows, DuckDB the standard grand-total row — excluded from the
    # random comparison
    assume(filtered.limit(1).count() > 0)
    grouped = (
        filtered.rollup(*groups) if mode == "rollup" else filtered.cube(*groups)
    )
    df = grouped.agg(
        F.grouping_id(*groups).cast("long").alias("gid"), *aggs_spark
    )
    sql_mode = "ROLLUP" if mode == "rollup" else "CUBE"
    sql = f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
               AS gid,
           {aggs_sql}
    FROM lineitem WHERE {pred_sql}
    GROUP BY {sql_mode}(l_returnflag, l_linestatus)
    """
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duckdb_result(con, sql)
    assert sorted(s_cols) == sorted(d_cols)
    assert normalize_rows(s_cols, s_rows) == normalize_rows(d_cols, d_rows), sql


def test_rollup_empty_input_divergence_is_pinned(ctx):
    """DOCUMENTED cross-engine divergence the fuzzer surfaced: GROUP BY
    ROLLUP/CUBE over an EMPTY input yields the SQL-standard grand-total
    row (count 0) in DuckDB but ZERO rows in Spark (Spark expands grouping
    sets before aggregation, so there is no group to aggregate). Catalog
    queries avoid the trap by construction (their inputs are non-empty);
    this test pins the behavior so a silent change in either engine
    surfaces here."""
    spark, con, li = ctx
    empty = li.where(F.col("l_quantity") < 0)
    assert empty.rollup("l_returnflag").agg(F.count(F.lit(1))).count() == 0
    rows = con.execute(
        "SELECT l_returnflag, COUNT(*) FROM lineitem WHERE l_quantity < 0 "
        "GROUP BY ROLLUP(l_returnflag)"
    ).fetchall()
    assert rows == [(None, 0)]
