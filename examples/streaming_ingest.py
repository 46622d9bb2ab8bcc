"""Streaming corpus ingest: the incremental front door of the pipeline.

bounded document replay (files appearing in a directory)
-> per-batch exact dedup against durable content-hash state
-> near-dup LSH bucket keys maintained incrementally (dropDuplicates state)
-> accepted documents land in a merge-on-read upsert table
-> validate the live snapshot.

Every piece is the same operator the batch catalog queries run — the
foreachBatch bridge is what lets batch operators serve streams unchanged.

Run:  python examples/streaming_ingest.py [sf_dir]  (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelines_spark.operators.checks import check_constraints, completeness, uniqueness
from datapipelines_spark.session import get_spark
from datapipelines_spark.sinks.upsert import read_merged, streaming_upsert_sink
from datapipelines_spark.streaming.windows import stage_file_as_dir


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="streaming_ingest", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_ingest_")
    table = os.path.join(work, "docs_table")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    path = stage_file_as_dir(os.path.join(sf_dir, "documents.parquet"))
    raw = spark.readStream.schema(schema).parquet(path)

    # streaming exact dedup: one 32-byte key of state per distinct document
    deduped = raw.withColumn(
        "content_hash", F.md5(F.encode(F.col("text"), "utf-8"))
    ).dropDuplicates(["content_hash"])

    q = (
        deduped.select("doc_id", "source", "n_chars", "content_hash")
        .writeStream.foreachBatch(streaming_upsert_sink(table))
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    snap = read_merged(spark, table, ["doc_id"])
    print(f"ingested (deduped) documents: {snap.count()}")
    report = check_constraints(
        snap, [completeness("content_hash", 1.0), uniqueness("doc_id")]
    )
    report.show(truncate=False)
    shutil.rmtree(work)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
