"""Single-pass data-quality constraint checking — the validation gate.

Production pipelines verify tables before training jobs consume them
(the Deequ/Great-Expectations pattern, both public designs): completeness,
uniqueness, value bounds, accepted domains. The engine-native version
computes EVERY requested measure in ONE aggregate pass over the table —
constraints are compiled to aggregate expressions, so adding a check adds
a column to the same scan, not a new job — and emits one row per
constraint with the observed value and a pass flag.

Uniqueness is the only constraint needing a distinct count; it shares the
single-pass aggregate via count_distinct (Catalyst plans the mixed
distinct/non-distinct aggregate with one expand, still one scan of the
input). At 100 TB the scan dominates and runs once regardless of how many
constraints ride on it.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def completeness(col: str, min_ratio: float = 1.0) -> dict:
    """Fraction of non-null values in ``col`` must be >= ``min_ratio``."""
    return {"kind": "completeness", "col": col, "min_ratio": min_ratio}


def uniqueness(col: str) -> dict:
    """``col`` must have no duplicate non-null values."""
    return {"kind": "uniqueness", "col": col}


def bounds(col: str, lo: float, hi: float) -> dict:
    """Every non-null value of ``col`` must lie in [lo, hi]."""
    return {"kind": "bounds", "col": col, "lo": lo, "hi": hi}


def accepted_values(col: str, values: Sequence[str]) -> dict:
    """Every non-null value of ``col`` must be one of ``values``."""
    return {"kind": "accepted_values", "col": col, "values": list(values)}


def _measure(c: dict, n: Column) -> tuple[Column, Column]:
    """(observed, passed) aggregate expressions for one constraint."""
    col = F.col(c["col"])
    if c["kind"] == "completeness":
        obs = F.round(F.count(col) / n, 6)
        return obs, obs >= c["min_ratio"]
    if c["kind"] == "uniqueness":
        obs = F.count_distinct(col).cast("double")
        return obs, obs == F.count(col).cast("double")
    if c["kind"] == "bounds":
        bad = F.sum(
            (col.isNotNull() & ~col.between(c["lo"], c["hi"])).cast("long")
        )
        return bad.cast("double"), bad == 0
    if c["kind"] == "accepted_values":
        bad = F.sum(
            (col.isNotNull() & ~col.isin(c["values"])).cast("long")
        )
        return bad.cast("double"), bad == 0
    raise ValueError(f"unknown constraint kind {c['kind']!r}")


def check_constraints(df: DataFrame, constraints: Sequence[dict]) -> DataFrame:
    """(constraint, column, observed, passed) — one row per constraint,
    computed in a single aggregate over ``df``.

    ``observed`` is the constraint's natural measure: the non-null ratio
    for completeness, the distinct count for uniqueness, the VIOLATION
    count for bounds/accepted_values."""
    if not constraints:
        raise ValueError("no constraints given")
    n = F.count(F.lit(1))
    aggs = []
    for i, c in enumerate(constraints):
        obs, ok = _measure(c, n)
        aggs.append(obs.alias(f"__obs{i}"))
        aggs.append(ok.alias(f"__ok{i}"))
    row = df.agg(*aggs)
    results = F.array(
        *[
            F.struct(
                F.lit(c["kind"]).alias("constraint"),
                F.lit(c["col"]).alias("column"),
                F.col(f"__obs{i}").cast("double").alias("observed"),
                F.col(f"__ok{i}").alias("passed"),
            )
            for i, c in enumerate(constraints)
        ]
    )
    return row.select(F.explode(results).alias("r")).select(
        "r.constraint", "r.column", "r.observed", "r.passed"
    )


def profile_table(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
) -> DataFrame:
    """(column, metric, value) — a corpus-report profile computed in ONE
    aggregate pass (same compile-to-expressions discipline as
    check_constraints).

    Numeric columns: n_null, n_distinct, min, max, mean (exact decimal
    sum / count, so the value is order-independent), median (exact
    continuous-interpolation percentile). String columns: n_null,
    n_distinct, min_len, max_len, avg_len. Every metric is emitted as
    double in long format, so the profile of any table is one narrow
    relation a report job can union across tables."""
    if not numeric_cols and not string_cols:
        raise ValueError("no columns given")
    aggs: list[Column] = []
    rows: list[tuple[str, str, str]] = []  # (column, metric, agg alias)

    def add(col: str, metric: str, expr: Column) -> None:
        alias = f"__m{len(aggs)}"
        aggs.append(expr.cast("double").alias(alias))
        rows.append((col, metric, alias))

    n = F.count(F.lit(1))
    for c in numeric_cols:
        col = F.col(c)
        add(c, "n_null", n - F.count(col))
        add(c, "n_distinct", F.count_distinct(col))
        add(c, "min", F.min(col))
        add(c, "max", F.max(col))
        add(
            c,
            "mean",
            F.round(
                F.sum(col.cast("decimal(28,6)")).cast("double") / F.count(col), 6
            ),
        )
        add(c, "median", F.round(F.percentile(col, F.lit(0.5)), 6))
    for c in string_cols:
        col = F.col(c)
        add(c, "n_null", n - F.count(col))
        add(c, "n_distinct", F.count_distinct(col))
        add(c, "min_len", F.min(F.length(col)))
        add(c, "max_len", F.max(F.length(col)))
        add(
            c,
            "avg_len",
            F.round(
                F.sum(F.length(col).cast("decimal(28,6)")).cast("double")
                / F.count(col),
                6,
            ),
        )
    one = df.agg(*aggs)
    out = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(m).alias("metric"),
                F.col(a).alias("value"),
            )
            for c, m, a in rows
        ]
    )
    return one.select(F.explode(out).alias("r")).select(
        "r.column", "r.metric", "r.value"
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    lo_permille: int = 50,
    hi_permille: int = 950,
) -> DataFrame:
    """Per-group discrete-percentile clipping: every row gains the group's
    lower/upper percentile value, the clipped value, and an outlier flag —
    the standard numeric-cleaning step before length/score features feed a
    quality model.

    Percentiles are DISCRETE (the ceil(p*n)-th smallest group value) with
    the rank computed in INTEGER arithmetic — ``(p_permille*n + 999) div
    1000`` — so the result is an exact element of the input, not an
    interpolated double. That is deliberate cross-engine discipline:
    interpolated quantiles (Spark ``percentile`` vs DuckDB
    ``quantile_cont``) associate their lerp differently and can disagree by
    1 ulp exactly at clip boundaries; element selection cannot.

    Plan shape: one window rank per group partition + one group count —
    both hash-partitioned on ``group_col``, no global sort, no collect. At
    scales where even a per-group sort is unwelcome, ``approx_percentile``
    bounds are the documented relaxation (the flag then becomes
    approximate; this exact form is the oracle-checkable contract).

    ``value_col`` must be an integral type: the exactness contract rests
    on bigint arithmetic, and silently truncating a fractional column
    would compute bounds, clips, and flags on the wrong values — so a
    non-integral column raises instead.
    """
    from pyspark.sql import Window
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    vtype = df.schema[value_col].dataType
    if not isinstance(vtype, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"winsorize requires an integral value_col (exact bigint "
            f"arithmetic is the contract); {value_col!r} is "
            f"{vtype.simpleString()} — cast or scale it to an integer "
            f"domain first"
        )

    # NULL values have no rank to clip at and would shift every other
    # row's percentile rank by the engine's null-ordering convention
    # (Spark sorts NULLS FIRST, most SQL engines LAST) — out of domain
    df = df.where(F.col(value_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc(), F.col(id_col).asc())
    ranked = df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col).cast("bigint").alias("__v"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("__n"),
    )
    lo_rank = F.expr(f"({lo_permille} * __n + 999) div 1000")
    hi_rank = F.expr(f"({hi_permille} * __n + 999) div 1000")
    bounds_df = (
        ranked.select(
            group_col,
            F.when(F.col("__rn") == lo_rank, F.col("__v")).alias("__lo"),
            F.when(F.col("__rn") == hi_rank, F.col("__v")).alias("__hi"),
        )
        .groupBy(group_col)
        .agg(F.max("__lo").alias("p_lo"), F.max("__hi").alias("p_hi"))
    )
    out = ranked.join(F.broadcast(bounds_df), group_col)
    clipped = F.least(F.greatest(F.col("__v"), F.col("p_lo")), F.col("p_hi"))
    return out.select(
        F.col(id_col),
        F.col(group_col),
        F.col("__v").alias(value_col),
        F.col("p_lo"),
        F.col("p_hi"),
        clipped.alias("clipped"),
        ((F.col("__v") < F.col("p_lo")) | (F.col("__v") > F.col("p_hi"))).alias(
            "is_outlier"
        ),
    )
