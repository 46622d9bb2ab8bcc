"""Sequence packing: assign documents to fixed-token-budget training packs.

The streaming concat-and-chunk layout used for LLM pretraining: documents
are concatenated in a deterministic order and split at every ``budget``
token boundary. Each document gets the pack it STARTS in plus its offset —
downstream loaders slice the pack windows; a document whose tokens straddle
a boundary spans into the next pack (no padding, no renumber shuffle).

This is a pure window computation — one shuffle on the partition columns,
then an ordered running sum; no driver-side loop, no UDF. At 100 TB the
partition columns (e.g. source shard) bound window state per task.

Reference parity: the reference's loader assembles fixed-size training
batches from an ordered stream (`/root/reference/sdata/dataset.py` batching
+ collation); packing is the token-budget generalization of that contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Add ``pack_id`` / ``pack_offset`` columns.

    ``pack_id`` = which budget-sized chunk the document's first token lands
    in when documents are concatenated in ``order_col`` order within each
    ``partition_cols`` group; ``pack_offset`` = position inside that chunk.
    All integer arithmetic (exact in any engine).
    """
    if int(budget) < 1:
        raise ValueError(f"budget must be >= 1, got {budget!r}")
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0).cast("long"))
    # `div` is INTEGER division on the bigint running sum: double `/` can
    # round 1 ulp off an exact quotient once the cumulative token count
    # passes 2^53 (same contract fix as oversample_to_parity's factor)
    return (
        df.withColumn("__pack_cum", cum_before)
        .withColumn("pack_id", F.expr(f"__pack_cum div {int(budget)}"))
        .withColumn("pack_offset", F.col("__pack_cum") % budget)
        .drop("__pack_cum")
    )


def pack_summary(
    packed: DataFrame, token_col: str, partition_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Per-pack roll-up: docs per pack and tokens STARTING in each pack."""
    return packed.groupBy(*partition_cols, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("n_tokens_started"),
    )
