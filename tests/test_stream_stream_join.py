"""Stream-stream interval join with watermarks on both sides: clicks joined
to subsequent purchases of the same user within 6 hours — the canonical
attribution join. Bounded replay must equal the batch formulation."""

import pyspark.sql.functions as F


def _sides(df):
    clicks = df.where(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    purchases = df.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


def _join(clicks, purchases):
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 6 HOURS")),
    ).select("user_id", "click_id", "purchase_id", "purchase_value")


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    from datapipelines_spark.sources.parquet import load_table
    from datapipelines_spark.streaming.windows import read_events_stream

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    s_clicks, s_purchases = _sides(stream)
    joined = _join(
        s_clicks.withWatermark("click_ts", "1 hour"),
        s_purchases.withWatermark("purchase_ts", "1 hour"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("ss_join")

    batch_events = load_table(spark, sf_dir, "events")
    b_clicks, b_purchases = _sides(batch_events)
    batch = _join(b_clicks, b_purchases)

    key = ["user_id", "click_id", "purchase_id"]
    got = sorted(map(tuple, streamed.select(*key, "purchase_value").collect()))
    want = sorted(map(tuple, batch.select(*key, "purchase_value").collect()))
    assert len(got) > 0
    assert got == want
