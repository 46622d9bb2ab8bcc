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


def incremental_state_sink(
    state_dir: str,
    keys: list[str],
    sum_cols: list[str],
    retract_col: str | None = None,
):
    """foreachBatch callback maintaining a MATERIALIZED VIEW state table on
    disk — streaming incremental view maintenance: each micro-batch
    collapses to its partial aggregate (delta) and merges with the current
    state; the view is always the aggregate of everything streamed so far,
    and per-batch cost is O(|state| + |batch|), independent of stream
    history. Swap protocol mirrors sinks/upsert.py:compact — write the
    merged state to a dot-staging dir (materializing the read of the old
    state BEFORE it is replaced), then swap — so a reader sees either the
    old or the new state, never a torn one.

    Use with ``.trigger(availableNow=True)`` + a fresh checkpoint for
    deterministic replays; for production exactly-once under retries pair
    with the epoch-marker discipline of streaming_upsert_sink."""
    import os
    import shutil

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = aggregate_state(batch_df, keys, sum_cols, retract_col)
        if os.path.isdir(state_dir):
            merged = merge_states(spark.read.parquet(state_dir), delta, keys)
        else:
            merged = delta
        staging = state_dir.rstrip("/") + f".staging-{int(epoch_id)}"
        shutil.rmtree(staging, ignore_errors=True)
        merged.write.mode("overwrite").parquet(staging)  # materializes read
        shutil.rmtree(state_dir, ignore_errors=True)
        os.rename(staging, state_dir)

    return process
