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
