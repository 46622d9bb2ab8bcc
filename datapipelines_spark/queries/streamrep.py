"""Bounded-replay Structured Streaming queries — the driver-checkable face of
datapipelines_spark/streaming/.

Each builder runs a REAL streaming query (readStream file source → stateful
operator → memory sink, ``trigger(availableNow=True)``) to completion and
returns the sink table, so the DuckDB oracle can verify the stream's
semantics — including what watermarking emits — not just a batch rewrite.

Emission rule encoded in the oracles (verified empirically on Spark 4.1):
with ``withWatermark(delay)`` and append output mode, the final watermark of
a bounded replay is ``max(event_ts) - delay``, and a no-data batch after the
last file flushes every window whose ``end <= watermark``. A window whose
end lands exactly on ``max_ts`` IS emitted; the window containing ``max_ts``
is not (its state would still be open on an unbounded stream).

Timestamps are exported as epoch-microsecond BIGINTs (``F.unix_micros``):
streaming needs TimestampType (not NTZ) for watermarks, and instants survive
any session timezone the driver happens to run under.

Reference parity: the reference library is purely epoch-iterating
(SURVEY.md §2.10 — no event-time semantics); these queries define the
engine's unbounded counterparts per sdata's gap surface.
"""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipelines_spark.catalog import query
from datapipelines_spark.streaming.windows import read_events_stream, run_bounded_to_memory

# Memory-sink table names must be unique per started query within a session
# (bench re-runs each builder several times).
_SINK_SEQ = itertools.count()


def _sink_name(prefix: str) -> str:
    return f"{prefix}_{next(_SINK_SEQ)}"


@query(
    "stream_tumbling_1h_replay",
    oracle="""
    WITH e AS (
        SELECT epoch_us(ts) AS us, event_type, value FROM events
    ),
    m AS (SELECT MAX(us) AS max_us FROM e)
    SELECT (us - us % 3600000000) AS window_start_us,
           event_type,
           COUNT(*) AS n_events,
           SUM(value) AS sum_value
    FROM e, m
    WHERE (us - us % 3600000000) + 3600000000 <= max_us
    GROUP BY 1, 2
    ORDER BY window_start_us, event_type
    """,
)
def stream_tumbling_1h_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type, run as a real append-mode
    stream with a zero-delay watermark over a bounded file replay.

    The oracle keeps only windows with ``end <= max(ts)`` — exactly the set
    the final watermark flushes; the trailing open window stays in state.
    """
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    out = run_bounded_to_memory(agg, _sink_name("stream_tumbling"), output_mode="append")
    return out.orderBy("window_start_us", "event_type")


@query(
    "stream_dedup_exact_replay",
    oracle="""
    SELECT DISTINCT md5(text) AS content_hash FROM documents ORDER BY content_hash
    """,
)
def stream_dedup_exact_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicates`` on a content hash over a
    bounded document replay (append mode, state = one 32-byte key per
    distinct document, exactly the batch operator's shuffle footprint).

    Only the hash column is emitted, so the result is the distinct-hash SET —
    independent of which duplicate arrives first — and DuckDB can oracle it
    with a plain DISTINCT.
    """
    import os

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    path = os.path.join(sf_dir, "documents.parquet")
    if os.path.isfile(path):
        import tempfile

        stage = tempfile.mkdtemp(prefix="docs_stream_")
        os.symlink(path, os.path.join(stage, os.path.basename(path)))
        path = stage
    raw = spark.readStream.schema(schema).parquet(path)
    deduped = (
        raw.select(F.md5(F.encode(F.col("text"), "utf-8")).alias("content_hash"))
        .dropDuplicates(["content_hash"])
    )
    out = run_bounded_to_memory(deduped, _sink_name("stream_dedup"), output_mode="append")
    return out.orderBy("content_hash")
