"""Incremental corpus dedup across micro-batches with durable hash state:
a document re-ingested in a LATER batch (beyond any watermark horizon) must
still be dropped."""

import glob
import os
import time

import pyspark.sql.functions as F
from pyspark.sql import types as T

from datapipelines_spark.streaming.dedup import streaming_exact_dedup

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def _write_batch(spark, d, rows, mtime):
    pre = set(glob.glob(os.path.join(d, "*.parquet")))
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(d)
    for f in set(glob.glob(os.path.join(d, "*.parquet"))) - pre:
        os.utime(f, (mtime, mtime))


def test_incremental_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    now = time.time()
    _write_batch(spark, src, [(1, "alpha text"), (2, "beta text"), (3, "alpha text")], now - 200)
    _write_batch(spark, src, [(4, "beta text"), (5, "gamma text"), (6, "alpha text")], now - 100)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = streaming_exact_dedup(
        stream,
        text_col="text",
        id_col="doc_id",
        out_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    out = spark.read.parquet(str(tmp_path / "out"))
    kept = {r["doc_id"]: r["text"] for r in out.collect()}
    # batch 1: alpha(1) kept, beta(2) kept, alpha(3) in-batch dup dropped
    # batch 2: beta(4) seen-before dropped, gamma(5) kept, alpha(6) dropped
    assert kept == {1: "alpha text", 2: "beta text", 5: "gamma text"}
    state = spark.read.parquet(str(tmp_path / "state"))
    assert state.select("content_hash").distinct().count() == 3


def test_batch_retry_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivery of an epoch (full retry
    after commit, or replay after rows landed but state didn't) must not
    duplicate output rows."""
    from datapipelines_spark.streaming.dedup import exact_dedup_batch_processor

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    process = exact_dedup_batch_processor("text", "doc_id", out, state)
    b0 = spark.createDataFrame([(1, "alpha"), (2, "beta")], SCHEMA)

    process(b0, 0)
    first = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert first == [1, 2]

    # retry of a FULLY committed epoch: skipped outright
    process(b0, 0)
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == [1, 2]

    # retry after rows landed but state write crashed: replays into the
    # same per-epoch directory (overwrite), still no duplicates
    import shutil

    shutil.rmtree(state)
    process(b0, 0)
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == [1, 2]

    # next epoch still dedups against all prior state
    b1 = spark.createDataFrame([(3, "alpha"), (4, "gamma")], SCHEMA)
    process(b1, 1)
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1, 2, 4]
