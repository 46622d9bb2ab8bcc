"""Bucketed tables: co-located joins and aggregations run shuffle-free —
the layout strategy SURVEY §7.5 prescribes for 100 TB fact-fact joins,
demonstrated end-to-end on the fixture tables."""

import pyspark.sql.functions as F
import pytest

from datapipelines_spark.sinks.writer import write_bucketed_table
from datapipelines_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    sf = "/root/testdata/sf0.001"
    write_bucketed_table(
        load_table(spark, sf, "lineitem"),
        "lineitem_b",
        bucket_by=["l_orderkey"],
        n_buckets=8,
        sort_by=["l_orderkey"],
        path=str(base / "lineitem_b"),
        mode="overwrite",
    )
    write_bucketed_table(
        load_table(spark, sf, "orders"),
        "orders_b",
        bucket_by=["o_orderkey"],
        n_buckets=8,
        sort_by=["o_orderkey"],
        path=str(base / "orders_b"),
        mode="overwrite",
    )
    yield
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    l = spark.table("lineitem_b")
    o = spark.table("orders_b")
    joined = l.join(o, l.l_orderkey == o.o_orderkey).where(
        ~F.col("o_orderstatus").isNull()
    )
    # disable broadcast so the join strategy decision is about bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        n = joined.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # correctness vs plain join
    sf = "/root/testdata/sf0.001"
    expected = (
        load_table(spark, sf, "lineitem")
        .join(load_table(spark, sf, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert n == expected


def test_bucketed_groupby_has_no_shuffle(spark, bucketed):
    l = spark.table("lineitem_b")
    agg = l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert agg.count() > 0
