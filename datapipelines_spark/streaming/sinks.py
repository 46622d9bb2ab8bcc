"""Streaming sinks: foreachBatch bridge into the batch operator registry.

``foreach_batch_pipeline`` lets every batch operator in this engine (dedup,
text stats, quality filters, writers) run unchanged inside a streaming query:
each micro-batch DataFrame flows through the given stages and lands in the
sink — the standard pattern for streaming ETL that needs operators
Structured Streaming can't express incrementally (exact dedup against the
batch, LSH bucketing, etc.).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def foreach_batch_pipeline(
    stream_df: DataFrame,
    stages: Sequence[Callable[[DataFrame], DataFrame]],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Run ``stages`` over each micro-batch, then hand the result to ``sink``
    (e.g. ``lambda df, epoch: write_dataset(df, path, mode='append')``)."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        out = batch_df
        for stage in stages:
            out = stage(out)
        sink(out, epoch_id)

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
