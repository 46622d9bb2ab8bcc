"""As-of join: the scalable union+carry-forward implementation must agree
with the naive inequality-join reference on every input shape."""

import datetime as dt

import pytest

from datapipelines_spark.operators.asof import asof_join, asof_join_via_range


@pytest.fixture()
def quotes_and_trades(spark):
    q = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 10, 0), 100.0),
            (1, dt.datetime(2024, 1, 1, 11, 0), 101.0),
            (1, dt.datetime(2024, 1, 1, 12, 0), 99.5),
            (2, dt.datetime(2024, 1, 1, 10, 30), 50.0),
        ],
        "sym int, qts timestamp_ntz, px double",
    )
    t = spark.createDataFrame(
        [
            (1, 1, dt.datetime(2024, 1, 1, 10, 30)),   # -> 100.0
            (2, 1, dt.datetime(2024, 1, 1, 11, 0)),    # same instant -> 101.0
            (3, 1, dt.datetime(2024, 1, 1, 9, 0)),     # before any quote -> null
            (4, 2, dt.datetime(2024, 1, 1, 23, 0)),    # -> 50.0
            (5, 3, dt.datetime(2024, 1, 1, 10, 0)),    # key with no quotes -> null
        ],
        "trade_id int, sym int, tts timestamp_ntz",
    )
    return q, t


def test_asof_basic_semantics(spark, quotes_and_trades):
    q, t = quotes_and_trades
    out = asof_join(t, q, key="sym", left_time="tts", right_time="qts", right_values=["px"])
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got == {1: 100.0, 2: 101.0, 3: None, 4: 50.0, 5: None}


def test_asof_matches_range_reference(spark, quotes_and_trades):
    q, t = quotes_and_trades
    fast = asof_join(t, q, key="sym", left_time="tts", right_time="qts", right_values=["px"])
    slow = asof_join_via_range(t, q, key="sym", left_time="tts", right_time="qts", right_values=["px"])
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))


def test_asof_matches_range_on_fixture(spark, sf_dir):
    import pyspark.sql.functions as F

    from datapipelines_spark.sources.parquet import load_table

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts").limit(200)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        F.col("o_totalprice").alias("px"),
    )
    # collapse ties on (user, date) so both implementations pick identically
    o = o.groupBy("user_id", "o_orderdate").agg(F.max("px").alias("px"))
    fast = asof_join(e, o, key="user_id", left_time="ts", right_time="o_orderdate", right_values=["px"])
    slow = asof_join_via_range(
        e, o, key="user_id", left_time="ts", right_time="o_orderdate", right_values=["px"]
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))
