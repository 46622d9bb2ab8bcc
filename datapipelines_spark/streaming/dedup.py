"""Incremental exact dedup over a stream: drop documents whose content hash
was seen in ANY earlier micro-batch, with durable state.

``dropDuplicatesWithinWatermark`` bounds state by event time; corpus dedup
needs *unbounded* history ("have we ever ingested this document"), which is
state Structured Streaming won't hold. The standard pattern is foreachBatch
with a durable seen-keys table:

    batch -> in-batch dedup -> anti-join seen-hashes -> sink new rows
          -> append new hashes to the seen table

The seen table holds one 32-char digest per unique document ever seen —
at 100 TB of text that is ~3 orders of magnitude smaller than the corpus,
and the anti-join is a shuffle on fixed-width keys (or broadcast while the
state is small).

Both the output and the state are laid out as ``.../epoch_id=N/`` partition
directories (readers see an extra ``epoch_id`` column): per-epoch overwrite
plus an already-committed-epoch skip makes the foreachBatch idempotent, so
a micro-batch retry after a partial failure can never double-append rows —
exactly-once output from an at-least-once callback.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def _seen_hashes(spark: SparkSession, state_path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(state_path)
    except Exception:  # first batch: no state yet
        return None


def exact_dedup_batch_processor(
    text_col: str, id_col: str, out_path: str, state_path: str
):
    """Build the idempotent foreachBatch callback (exposed for direct
    retry-semantics testing; production entry is ``streaming_exact_dedup``)."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        # Idempotence contract (exactly-once output under micro-batch
        # retries): every write is an OVERWRITE of a per-epoch directory,
        # and a retry of an epoch whose state already landed is skipped
        # outright. Rows are written before state, so state present ⇒ rows
        # present; a crash between the writes just replays the epoch into
        # the same directories.
        spark = batch_df.sparkSession
        epoch = int(epoch_id)
        seen = _seen_hashes(spark, state_path)
        if (
            seen is not None
            and "epoch_id" in seen.columns
            and seen.where(F.col("epoch_id") == epoch).limit(1).count() > 0
        ):
            return  # fully-committed epoch re-delivered after a checkpoint hiccup
        hashed = batch_df.withColumn("__h", F.md5(F.col(text_col)))
        # in-batch dedup first (min id wins), then against history
        from pyspark.sql import Window

        w = Window.partitionBy("__h").orderBy(id_col)
        fresh = hashed.withColumn("__rn", F.row_number().over(w)).where(
            F.col("__rn") == 1
        ).drop("__rn")
        if seen is not None:
            fresh = fresh.join(seen, fresh["__h"] == seen["content_hash"], "left_anti")
        fresh = fresh.persist()
        try:
            fresh.drop("__h").write.mode("overwrite").parquet(
                f"{out_path}/epoch_id={epoch}"
            )
            fresh.select(F.col("__h").alias("content_hash")).write.mode(
                "overwrite"
            ).parquet(f"{state_path}/epoch_id={epoch}")
        finally:
            fresh.unpersist()

    return process


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    out_path: str,
    state_path: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start a stream that appends only never-seen-before documents to
    ``out_path``, maintaining content-hash state at ``state_path``."""
    process = exact_dedup_batch_processor(text_col, id_col, out_path, state_path)
    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
