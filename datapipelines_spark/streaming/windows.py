"""Structured Streaming operators: event-time windows with watermarks.

The reference has no event-time streaming (its infinite iteration is epoch
cycling, SURVEY §2.10); this module supplies the unbounded counterparts of
queries/events.py using the *same* window expressions, so bounded replays
are oracle-checkable while the operators themselves run on real streams.

Sources: any streaming DataFrame works. ``read_events_stream`` replays the
``events`` fixture through a bounded file stream (one parquet), which is how
the tests drive late/out-of-order data; production would point at Kafka /
file drops with the identical downstream code.

Watermark discipline: every aggregation takes ``watermark`` (how late data
may arrive). State eviction follows from it — without a watermark, session
and window state grows unboundedly at 100 TB/day rates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: path -> (batch-inferred schema, staged source dir). One footer read and
#: one symlink-staging tempdir per fixture path per process.
_STREAM_SOURCE_CACHE: dict[str, tuple] = {}

#: path -> staged dir (no schema), for sources that declare their own schema.
_STAGE_CACHE: dict[str, str] = {}


def stage_file_as_dir(path: str) -> str:
    """Return a directory the file-stream source can monitor for ``path``:
    the path itself if already a directory, else a cached symlink-staging
    tempdir (one per path per process — no leak on repeated builds)."""
    import os

    if not os.path.isfile(path):
        return path
    staged = _STAGE_CACHE.get(path)
    if staged is None:
        import tempfile

        staged = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(path, os.path.join(staged, os.path.basename(path)))
        _STAGE_CACHE[path] = staged
    return staged


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events fixture as a file-source stream.

    The ``ts`` column's parquet logical type is NOT hardcoded: we take the
    schema a batch ``spark.read.parquet`` infers (one footer read) and branch
    on what actually arrived — TIMESTAMP(NANOS) fixtures surface as long
    (``nanosAsLong``) and are truncated to microseconds, TIMESTAMP(MICROS)
    fixtures surface as (ntz) timestamps and are used as-is — so stream and
    batch results are comparable row-for-row whichever way the fixture was
    written.
    """
    import os

    from pyspark.sql import types as T

    # Same conf the batch reader sets: without it a NANOS fixture is
    # rejected by the vectorized reader before we can inspect its schema.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = sf_dir if sf_dir.endswith(".parquet") else os.path.join(sf_dir, "events.parquet")
    cached = _STREAM_SOURCE_CACHE.get(path)
    if cached is None:
        schema = spark.read.parquet(path).schema  # one footer read per path
        src = path
        if os.path.isfile(path):
            # The file-stream source monitors directories; stage a symlink
            # dir so a single-file fixture replays without copying bytes.
            # Cached per source path — repeated builder invocations (bench
            # repeats, the differential suite's six replay queries) reuse
            # one staging dir instead of leaking a tempdir per call.
            import tempfile

            src = tempfile.mkdtemp(prefix="events_stream_")
            os.symlink(path, os.path.join(src, os.path.basename(path)))
        cached = (schema, src)
        _STREAM_SOURCE_CACHE[path] = cached
    schema, src = cached
    ts_type = schema["ts"].dataType
    raw = spark.readStream.schema(schema).parquet(src)
    # Watermarks need TimestampType (not NTZ); with the session pinned to UTC
    # the cast/conversion below lands on the same microsecond instants the
    # batch reader (sources/parquet.py load_table) produces.
    if isinstance(ts_type, T.LongType):
        # TIMESTAMP(NANOS) read as int64: integer-divide to micros (floor),
        # matching load_table and DuckDB's NS->US coercion.
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window counts per event type (append-able once the
    watermark passes the window end)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding event-time windows (width/slide)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_aggregate(
    events: DataFrame, gap: str = "6 hours", watermark: str = "12 hours"
) -> DataFrame:
    """Session windows per user (dynamic-length state merged by gap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def run_bounded_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Execute a bounded stream to completion into an in-memory sink and
    return the result table — the test harness for streaming operators
    (availableNow processes all data then stops)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
