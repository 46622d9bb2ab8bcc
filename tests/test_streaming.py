"""Structured Streaming tests: bounded replay of the events fixture must
reproduce the batch results (queries/events.py semantics) exactly."""

import pyspark.sql.functions as F
import pytest

from datapipelines_spark.queries.events import events_tumbling_1h
from datapipelines_spark.streaming.windows import (
    read_events_stream,
    run_bounded_to_memory,
    session_aggregate,
    tumbling_counts,
)


@pytest.fixture()
def events_stream(spark, sf_dir):
    return read_events_stream(spark, f"{sf_dir}/events.parquet")


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_stream_tumbling_matches_batch(spark, sf_dir, events_stream):
    streamed = run_bounded_to_memory(
        tumbling_counts(events_stream), "tumbling_test", "complete"
    )
    batch = events_tumbling_1h(spark, sf_dir)
    assert _rows(streamed, "window_start", "event_type") == _rows(
        batch, "window_start", "event_type"
    )


def test_stream_session_matches_batch(spark, sf_dir, events_stream):
    from datapipelines_spark.queries.events import events_session_windows

    streamed = run_bounded_to_memory(
        session_aggregate(events_stream), "session_test", "complete"
    )
    batch = events_session_windows(spark, sf_dir)
    assert _rows(streamed, "user_id", "session_start") == _rows(
        batch, "user_id", "session_start"
    )


def test_stream_stateful_running_stats(spark, sf_dir, events_stream):
    from datapipelines_spark.streaming.stateful import user_running_stats

    streamed = run_bounded_to_memory(
        user_running_stats(events_stream), "stateful_test", "update"
    )
    # update-mode memory sink keeps every emitted row; the last per user is
    # the final state. One microbatch here -> exactly one row per user.
    from datapipelines_spark.sources.parquet import load_table

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6), r["max_value"])
           for r in streamed.collect()}
    want = {r["user_id"]: (r["n_events"], round(r["total_value"], 6), r["max_value"])
            for r in batch.collect()}
    assert got == want


def test_stream_handles_late_data_with_watermark(spark, tmp_path):
    """A row arriving behind the watermark is dropped and cannot mutate an
    already-emitted window.

    Spark's late-record filter uses the watermark in force while a batch is
    processed, which advances one batch behind the data (observed on 4.1:
    batch N's filter reflects data through batch N-1). So the late row is
    staged as a *third* microbatch, after the watermark has passed its
    window's end.
    """
    import datetime as dt
    import glob
    import os
    import time

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    d = os.path.join(tmp_path, "stream_in")
    now = time.time()

    def write(rows, mtime):
        pre = set(glob.glob(os.path.join(d, "*.parquet")))
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(d)
        for f in set(glob.glob(os.path.join(d, "*.parquet"))) - pre:
            os.utime(f, (mtime, mtime))

    write([(1, base, 1.0), (2, base + dt.timedelta(hours=5), 1.0)], now - 300)
    write([(4, base + dt.timedelta(hours=6), 1.0)], now - 200)
    # 4.5 h late vs a 1 h watermark; its window [12:00, 13:00) closed in batch 1
    write([(3, base + dt.timedelta(minutes=30), 100.0)], now - 100)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .select(F.col("w.start").alias("window_start"), "n", "s")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1
    first_window = [
        r for r in spark.table("late_test").collect() if r["window_start"] == base
    ]
    # emitted exactly once, without the late row's value
    assert [(r["n"], r["s"]) for r in first_window] == [(1, 1.0)]


def test_stream_transform_with_state_profile(spark, sf_dir, events_stream):
    """transformWithStateInPandas (typed MapState) must reproduce the batch
    per-user event-type profile on a bounded replay.

    Requires google.protobuf (the TWS driver-worker protocol); skipped where
    the package is unavailable — see streaming/tws.py docstring."""
    pytest.importorskip("google.protobuf.descriptor")
    from datapipelines_spark.sources.parquet import load_table
    from datapipelines_spark.streaming.tws import user_event_type_profile

    streamed = run_bounded_to_memory(
        user_event_type_profile(events_stream), "tws_test", "update"
    )
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    batch = (
        per_type.groupBy("user_id")
        .agg(
            F.sum("n").alias("n_events"),
            F.count(F.lit(1)).alias("n_event_types"),
            F.array_sort(F.collect_list(F.struct(F.col("n"), F.col("event_type")))).alias(
                "pairs"
            ),
        )
        .select(
            "user_id",
            "n_events",
            "n_event_types",
            F.expr(
                "element_at(filter(pairs, p -> p.n = pairs[size(pairs)-1].n), 1).event_type"
            ).alias("top_event_type"),
        )
    )
    got = {r["user_id"]: (r["n_events"], r["n_event_types"], r["top_event_type"])
           for r in streamed.collect()}
    want = {r["user_id"]: (r["n_events"], r["n_event_types"], r["top_event_type"])
            for r in batch.collect()}
    assert got == want


def test_tws_processor_logic_with_fake_state():
    """The StatefulProcessor's accumulation/mode logic, driven directly with
    a fake MapState — exercises everything but the protobuf wire protocol
    (which the container lacks; see streaming/tws.py)."""
    import pandas as pd

    from datapipelines_spark.streaming.tws import UserEventTypeProfile

    class FakeMapState:
        def __init__(self):
            self.d = {}

        def containsKey(self, k):
            return k in self.d

        def getValue(self, k):
            return self.d[k]

        def updateValue(self, k, v):
            self.d[k] = v

        def iterator(self):
            return iter(sorted(self.d.items()))

    p = UserEventTypeProfile()
    p._counts = FakeMapState()
    batch1 = pd.DataFrame({"event_type": ["click", "view", "click"]})
    (out1,) = p.handleInputRows((7,), iter([batch1]), None)
    assert out1.iloc[0].to_dict() == {
        "user_id": 7, "n_events": 3, "n_event_types": 2, "top_event_type": "click",
    }
    # second microbatch: 'view' ties 'click' at 2 -> lexicographic winner
    batch2 = pd.DataFrame({"event_type": ["view"]})
    (out2,) = p.handleInputRows((7,), iter([batch2]), None)
    assert out2.iloc[0].to_dict() == {
        "user_id": 7, "n_events": 4, "n_event_types": 2, "top_event_type": "click",
    }
