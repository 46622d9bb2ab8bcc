"""As-of join: for each left row, the most recent right row at or before the
left row's time, per key — the standard point-in-time lookup (market data,
feature stores). Spark has no built-in; this composes one from existing
operators, two ways:

- ``asof_join`` (union+window): tag both sides, union on (key, time), sort
  within key, carry the last right row forward with ``last(..., ignorenulls)``
  over a running window, keep left rows. ONE shuffle on (key), no range
  explosion — the 100 TB path (this is how sort-merge as-of works natively).
- ``asof_join_via_range`` (join+aggregate): inequality join then max-per-left
  — simple, correct, but O(matches) intermediate; only for small rights.

Null semantics: left rows with no prior right row keep null right columns
(like a left join).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
) -> DataFrame:
    """Point-in-time join via union + last-value-carry-forward window.

    Output: all left columns + ``right_values`` (from the latest right row
    with ``right_time <= left_time`` on the same key, ties broken toward the
    later right row in sort order).
    """
    lcols = left.columns
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    l_tagged = left.select(
        key,
        F.col(left_time).cast("timestamp_ntz").alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in right_values],
        *[F.col(c).alias(f"__l_{c}") for c in lcols if c != key],
    )
    r_tagged = right.select(
        key,
        F.col(right_time).cast("timestamp_ntz").alias("__t"),
        F.lit(0).alias("__is_left"),
        *right_values,
        *[F.lit(None).cast(ltypes[c]).alias(f"__l_{c}") for c in lcols if c != key],
    )
    # right rows sort before left rows at equal timestamps so "at or before"
    # includes same-instant right rows
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        key,
        "__t",
        "__is_left",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_values],
        *[F.col(f"__l_{c}") for c in lcols if c != key],
    )
    return carried.where(F.col("__is_left") == 1).select(
        *[
            F.col(key) if c == key else F.col(f"__l_{c}").alias(c)
            for c in lcols
        ],
        *right_values,
    )


def asof_join_via_range(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
) -> DataFrame:
    """Reference implementation: inequality join + argmax. Quadratic in
    matches per key — use only to validate asof_join or for tiny rights."""
    l = left.alias("l")
    r = right.alias("r")
    joined = l.join(
        r,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_time}") <= F.col(f"l.{left_time}")),
        "left",
    )
    w = Window.partitionBy(*[F.col(f"l.{c}") for c in left.columns]).orderBy(
        F.col(f"r.{right_time}").desc_nulls_last()
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            *[F.col(f"l.{c}").alias(c) for c in left.columns],
            *[F.col(f"r.{c}").alias(c) for c in right_values],
        )
    )
