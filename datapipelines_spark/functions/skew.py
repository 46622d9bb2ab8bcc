"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting handles most runtime skew automatically (enabled in
session.py); these helpers cover the two cases AQE can't fix:

- a single hot *aggregation* key (AQE splits join partitions, not hash-agg
  groups): ``salted_agg`` runs partial aggregation over (key, salt), then a
  cheap final pass over the tiny (key × n_salts) table;
- a broadcast-ineligible join with a known hot key: ``salted_join`` explodes
  the build side ``n_salts`` ways and salts the probe side to match.

Salts derive from data (xxhash of the row's unique column) so retries are
deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, unique_col: str, n_salts: int = 16, salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) derived from a unique column."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)))


def salted_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    unique_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase sum for skewed group keys: shuffle on (key, salt) spreads a
    hot key over ``n_salts`` reducers; the final combine is over at most
    |groups| × n_salts rows."""
    salted = with_salt(df, unique_col, n_salts)
    partial = salted.groupBy(*group_cols, "__salt").agg(F.sum(value_col).alias("__partial"))
    return partial.groupBy(*group_cols).agg(F.sum("__partial").alias(f"sum_{value_col}"))


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 16,
    probe_unique_col: str | None = None,
) -> DataFrame:
    """Equi-join resilient to a hot probe-side key: replicate each build row
    ``n_salts`` times with salt ids, salt probe rows deterministically, join
    on (key, salt). Build-side cost ×n_salts; probe skew ÷n_salts."""
    build_exploded = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    key = probe_unique_col or on
    probe_salted = probe.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(key)), F.lit(n_salts)).cast("int")
    )
    return probe_salted.join(build_exploded, [on, "__salt"]).drop("__salt")
