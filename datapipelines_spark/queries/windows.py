"""Window functions: ranking, frames, lag/lead — absent from the reference
(SURVEY §2.10), supplied by Spark's Window API.

Every ORDER BY inside a window carries a unique-key tiebreak so results are
deterministic and oracle-hashable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipelines_spark.catalog import query
from datapipelines_spark.sources.parquet import load_table


@query(
    "window_topk_parts_per_supplier",
    oracle="""
    WITH part_rev AS (
        SELECT l_suppkey, l_partkey,
               SUM(l_extendedprice * (1 - l_discount)) AS revenue
        FROM lineitem
        GROUP BY l_suppkey, l_partkey
    ), ranked AS (
        SELECT l_suppkey, l_partkey, revenue,
               ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                  ORDER BY revenue DESC, l_partkey) AS rn
        FROM part_rev
    )
    SELECT l_suppkey, l_partkey, revenue, rn
    FROM ranked WHERE rn <= 3
    ORDER BY l_suppkey, rn
    """,
)
def window_topk_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: agg → row_number window → filter rn<=k.

    The window partitions on the same key as the aggregation, so the sort
    happens within already-shuffled partitions — one shuffle total.
    """
    l = load_table(spark, sf_dir, "lineitem")
    part_rev = l.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    w = Window.partitionBy("l_suppkey").orderBy(F.desc("revenue"), F.asc("l_partkey"))
    return (
        part_rev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .orderBy("l_suppkey", "rn")
    )


@query(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_spend,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    ORDER BY o_custkey, order_seq
    """,
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame (ROWS UNBOUNDED PRECEDING..CURRENT ROW) per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
                "running_spend"
            ),
            F.row_number().over(w).alias("order_seq"),
        ).orderBy("o_custkey", "order_seq")
    )


@query(
    "window_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG analytic: days between a customer's consecutive orders."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date"))
        .cast("bigint")
        .alias("days_since_prev"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@query(
    "window_price_rank_in_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           RANK()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank,
           CAST(NTILE(4) OVER (PARTITION BY p_brand
                               ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS price_quartile
    FROM part
    ORDER BY p_brand, p_retailprice DESC, p_partkey
    """,
)
def window_price_rank_in_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / NTILE in one window pass."""
    p = load_table(spark, sf_dir, "part")
    w_price = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    w_tiled = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w_price).alias("price_rank"),
        F.dense_rank().over(w_price).alias("price_dense_rank"),
        F.ntile(4).over(w_tiled).alias("price_quartile"),
    ).orderBy("p_brand", F.desc("p_retailprice"), "p_partkey")


@query(
    "window_moving_avg_events",
    oracle="""
    SELECT user_id, event_id,
           AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg_3,
           MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_max_3
    FROM events WHERE ts IS NOT NULL
    ORDER BY user_id, event_id
    """,
)
def window_moving_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding row frame (3-row moving average/max) over the event stream —
    events WITH a timestamp (each engine orders NULL ts differently, so a
    NULL would shift which rows share a frame)."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return e.select(
        "user_id",
        "event_id",
        F.avg("value").over(w).alias("moving_avg_3"),
        F.max("value").over(w).alias("moving_max_3"),
    ).orderBy("user_id", "event_id")


@query(
    "window_range_frame_30d_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_30d,
           COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ) AS n_orders_30d
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_range_frame_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) window frame: per customer, the rolling 30-day
    spend and order count ending at each order — peers are chosen by ORDER
    KEY DISTANCE, not row position, so same-day orders aggregate together
    regardless of row order (the property ROWS frames cannot express).

    Expressed through the SQL window spec (the DataFrame API's rangeBetween
    takes long offsets only; interval ranges are SQL-first in both engines).
    Decimal sums keep rolling totals exact."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_range_frame")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS spend_30d,
               COUNT(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
               ) AS n_orders_30d
        FROM __orders_range_frame
        ORDER BY o_custkey, o_orderkey
        """
    )


@query(
    "interval_open_orders_sweep",
    oracle="""
    WITH iv AS (
        SELECT CAST(o.o_orderdate AS DATE) AS s,
               CAST(l.l_shipdate AS DATE) AS e
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    deltas AS (
        SELECT s AS d, 1 AS delta FROM iv
        UNION ALL
        SELECT e + 1, -1 FROM iv
    ),
    agg AS (SELECT d, SUM(delta) AS net FROM deltas GROUP BY d)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(net AS BIGINT) AS net,
           CAST(SUM(net) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_open
    FROM agg ORDER BY day
    """,
)
def interval_open_orders_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-interval counting by SWEEP LINE: how many lineitems are
    'in flight' (order placed, not yet shipped) on each boundary day. Each
    [o_orderdate, l_shipdate] interval contributes +1 at its start and -1
    the day after its end; a pre-aggregated running sum over the ~2.5k
    distinct boundary dates yields the concurrency profile. That is the
    O(n) scale shape — the naive explode(sequence(start, end)) multiplies
    every interval by its length in days and shuffles interval x days
    rows; the sweep shuffles 2 rows per interval and windows over the
    AGGREGATED date axis (bounded by the calendar, not the data)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("e")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.to_date("o_orderdate").alias("s"),
    )
    iv = li.join(o, "l_orderkey")
    deltas = iv.select(F.col("s").alias("d"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.date_add("e", 1).alias("d"), F.lit(-1).alias("delta"))
    )
    agg = deltas.groupBy("d").agg(F.sum("delta").cast("bigint").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        agg.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "net",
            F.sum("net").over(w).cast("bigint").alias("n_open"),
        )
        .orderBy("day")
    )


@query(
    "histogram_equidepth_price",
    oracle="""
    WITH t AS (
        SELECT o_orderstatus, o_totalprice,
               ntile(8) OVER (PARTITION BY o_orderstatus
                              ORDER BY o_totalprice, o_orderkey) AS bucket
        FROM orders
    )
    SELECT o_orderstatus, CAST(bucket AS BIGINT) AS bucket,
           COUNT(*) AS n,
           round(MIN(o_totalprice), 2) AS price_min,
           round(MAX(o_totalprice), 2) AS price_max
    FROM t GROUP BY 1, 2
    ORDER BY o_orderstatus, bucket
    """,
)
def histogram_equidepth_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (the optimizer-statistics shape): 8 equal-count
    price buckets per order status via a partitioned ntile, then bucket
    boundaries as (count, min, max) — the complement of the equal-WIDTH
    text_length_histogram. The window partitions on o_orderstatus (never a
    global sort); tie order pinned by (o_totalprice, o_orderkey) so bucket
    assignment is deterministic cross-engine."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderstatus",
        "o_totalprice",
        F.ntile(8)
        .over(
            Window.partitionBy("o_orderstatus").orderBy(
                "o_totalprice", "o_orderkey"
            )
        )
        .alias("bucket"),
    )
    return (
        t.groupBy("o_orderstatus", F.col("bucket").cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("price_min"),
            F.round(F.max("o_totalprice"), 2).alias("price_max"),
        )
        .orderBy("o_orderstatus", "bucket")
    )
