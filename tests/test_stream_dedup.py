"""Streaming deduplication: dropDuplicatesWithinWatermark removes replayed
events inside the watermark horizon — exact dedup as a stream operator."""

import datetime as dt

import pyspark.sql.functions as F
from pyspark.sql import types as T


def test_stream_drop_duplicates_within_watermark(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        (1, base, 1.0),
        (2, base + dt.timedelta(minutes=5), 2.0),
        (1, base + dt.timedelta(minutes=1), 1.0),   # duplicate id, replayed
        (3, base + dt.timedelta(minutes=10), 3.0),
        (2, base + dt.timedelta(minutes=6), 2.0),   # duplicate id
    ]
    d = str(tmp_path / "in")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)

    stream = (
        spark.readStream.schema(schema)
        .parquet(d)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("stream_dedup")
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [1, 2, 3]


def test_rescaler_uint8_mode(spark):
    from datapipelines_spark.operators.transforms import Rescaler

    df = spark.createDataFrame([(1, [0.0, 127.5, 255.0])], "id int, jpg array<double>")
    out = Rescaler(key="jpg", isfloat=False).apply(df).collect()[0]["jpg"]
    assert out == [-1.0, 0.0, 1.0]
