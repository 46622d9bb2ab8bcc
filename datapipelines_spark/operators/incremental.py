"""Incremental aggregate maintenance — keep a materialized rollup current
without rescanning the base table.

A 100 TB corpus with a daily delta should not pay a 100 TB scan to refresh
``revenue by month``: for distributive aggregates (COUNT, SUM — and AVG as
SUM/COUNT at read time) the classic counting algorithm (Gupta/Mumick's
incremental view maintenance, public literature) maintains the view as a
PARTIAL-AGGREGATE STATE table merged with each delta's partial aggregate:

  state:   (keys..., __cnt, sum_<c>...) — one row per group;
  delta:   the same aggregate over the new rows only; DELETES/corrections
           ride along as retraction rows (sign -1), so an upstream fix
           subtracts exactly what it once added;
  merge:   union the two states and re-sum per group — the shuffle carries
           O(|state| + |delta groups|) rows, never the base table; groups
           whose count reaches zero vanish (retractions consumed them).

Numeric discipline: sums are kept as DECIMAL(18,4)-based accumulators, so
merging is exact and order-independent — a state merged in any delta order
equals the full recompute to the last digit (the property the catalog
oracle checks). Doubles would drift under reordering; decimals cannot.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

CNT_COL = "__cnt"


def aggregate_state(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    retract_col: str | None = None,
) -> DataFrame:
    """Partial-aggregate state (keys..., __cnt, sum_<c>...) for a slice of
    the base table. ``retract_col`` (boolean) marks rows whose prior
    contribution must be SUBTRACTED (sign -1) — the delta encoding for
    deletes and corrections."""
    sign = (
        F.when(F.col(retract_col), F.lit(-1)).otherwise(F.lit(1))
        if retract_col
        else F.lit(1)
    )
    aggs = [F.sum(sign).alias(CNT_COL)] + [
        F.sum(F.col(c).cast("decimal(18,4)") * sign).alias(f"sum_{c}")
        for c in sum_cols
    ]
    return df.groupBy(*keys).agg(*aggs)


def merge_states(state: DataFrame, delta_state: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two partial-aggregate states: union + one re-sum per group
    (every non-key column is a mergeable accumulator by construction).
    Groups whose merged count is 0 are dropped — fully retracted. The
    shuffle is state-sized; the base table is never touched."""
    acc_cols = [c for c in state.columns if c not in keys]
    merged = (
        state.unionByName(delta_state)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in acc_cols])
    )
    return merged.where(F.col(CNT_COL) != 0)
