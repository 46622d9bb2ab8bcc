"""Core relational surface: scan-filter-aggregate, the join family, grouping sets.

The reference has no aggregation/join SQL surface of its own (SURVEY §2.10) —
its only joins are the metadata equi/semi joins (J2-J4). These queries cover
that join family plus the full relational algebra the oracle corpus exercises,
all as built-in DataFrame ops so Catalyst picks physical plans (broadcast for
the small dims, sort-merge/shuffled-hash for the fact-fact joins, AQE rewrites
at runtime).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipelines_spark.catalog import query
from datapipelines_spark.sources.parquet import load_table


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity)                                        AS sum_qty,
           SUM(l_extendedprice)                                   AS sum_base_price,
           SUM(l_extendedprice * (1 - l_discount))                AS sum_disc_price,
           SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))  AS sum_charge,
           AVG(l_quantity)                                        AS avg_qty,
           AVG(l_extendedprice)                                   AS avg_price,
           AVG(l_discount)                                        AS avg_disc,
           COUNT(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → pushed filter → partial+final agg → sort.

    Flagship: single pass over the fact table, no joins, no Python. The
    shipdate predicate reaches the parquet scan (PushedFilters) and only the
    8 referenced columns are read (ReadSchema) — at 100 TB this is the
    difference between scanning the table and scanning a fifth of it.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey                                   AS l_orderkey,
           SUM(l.l_extendedprice * (1 - l.l_discount))    AS revenue,
           o.o_orderdate                                  AS o_orderdate,
           o.o_orderpriority                              AS o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact joins → agg → top-k.

    customer is broadcast (dim side, filtered further by segment); the
    orders⋈lineitem join shuffles on orderkey — the natural key both sides
    are already bucketed on in a production layout. Top-k is orderBy+limit,
    which Spark executes as TakeOrderedAndProject (no full sort materialized).
    """
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS n_name,
           SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table snowflake join with local-supplier predicate.

    region/nation/supplier/customer are broadcast; only orders⋈lineitem
    shuffles. The c_nationkey = s_nationkey equality rides on the supplier
    join condition, so no extra shuffle stage.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    ORDER BY c_custkey
    """,
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — the reference's meta-shard pre-filter semantics
    (J3, /root/reference/sdata/datapipeline.py:400-404): keep left rows that
    have a match, emit left columns only, never duplicate."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c.c_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
    ORDER BY c_custkey
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers lacking any very-large order (the filtered
    right side keeps the result non-trivial — every fixture customer has at
    least one order)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 350000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "join_outer_order_counts",
    oracle="""
    SELECT c.c_custkey AS c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           COALESCE(SUM(o.o_totalprice), 0.0) AS total_spend
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    ORDER BY c_custkey
    """,
)
def join_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving unmatched customers (count 0, spend 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


@query(
    "agg_distinct_suppliers_per_flag",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_distinct_suppliers_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate (expand-based plan)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): sketches are engine-specific,
    so the oracle contract is accuracy, not equality — the query emits the
    exact count plus a flag asserting the sketch landed within its 5%
    relative-error budget. At 100 TB the sketch is the only option: fixed
    memory per group vs an exact distinct's shuffle of every key.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", rsd=0.05).alias("__approx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("__approx") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("approx_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_theta_sketch_distinct",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(DISTINCT CASE
                   WHEN CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)
                        AS BIGINT) < 536870912
                   THEN l_partkey END) AS n_sampled,
               COUNT(DISTINCT l_partkey) AS exact_distinct
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           n_sampled,
           CAST(floor(n_sampled * 8 / 1) AS BIGINT) AS est_distinct,
           CAST(CASE WHEN exact_distinct = 0 THEN 0
                ELSE floor(abs(CAST(floor(n_sampled * 8 / 1) AS BIGINT)
                               - exact_distinct) * 10000 / exact_distinct)
                END AS BIGINT) AS rel_err_pct_x100,
           exact_distinct
    FROM s
    ORDER BY l_returnflag
    """,
)
def agg_theta_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct parts per return flag via the θ=1/8 hash-sample sketch
    (operators/sketch.py:theta_sampled_distinct — the fixed-threshold
    KMV/Theta family): the map-side hash filter means only ~1/8 of the
    distinct keys ever shuffle, the survivor count is exact integer data,
    and the estimate is integer arithmetic — so unlike the HLL query above
    (engine-private registers, accuracy-flag contract) this sketch is
    oracle-checked BIT-EXACT, estimate and achieved error included."""
    from datapipelines_spark.operators.sketch import theta_sampled_distinct

    l = load_table(spark, sf_dir, "lineitem")
    return theta_sampled_distinct(
        l, ["l_returnflag"], "l_partkey", theta_num=1, theta_den=8
    ).orderBy("l_returnflag")


@query(
    "rollup_order_totals",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           SUM(o_totalprice) AS total_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.sum("o_totalprice").alias("total_price"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "cube_lineitem_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 2^k grouping combinations)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "having_big_part_groups",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts, AVG(p_retailprice) AS avg_price
    FROM part
    WHERE p_size >= 10
    GROUP BY p_brand
    HAVING COUNT(*) >= 3
    ORDER BY p_brand
    """,
)
def having_big_part_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter → group → HAVING-style post-aggregation filter."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.where(F.col("p_size") >= 10)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"), F.avg("p_retailprice").alias("avg_price"))
        .where(F.col("n_parts") >= 3)
        .orderBy("p_brand")
    )


@query(
    "subquery_above_avg_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def subquery_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (uncorrelated) — via crossJoin of a
    1-row aggregate, the plan Catalyst itself produces for scalar subqueries."""
    o = load_table(spark, sf_dir, "orders")
    threshold = o.agg((F.avg("o_totalprice") * 1.5).alias("__thr"))
    return (
        o.crossJoin(F.broadcast(threshold))
        .where(F.col("o_totalprice") > F.col("__thr"))
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "diag_join_key_skew",
    oracle="""
    WITH c AS (
        SELECT o_custkey AS key, COUNT(*) AS n FROM orders GROUP BY o_custkey
    ),
    m AS (
        SELECT SUM(n) * 1.0 / COUNT(*) AS mean_n FROM c
    )
    SELECT key, n,
           CAST(FLOOR(1000.0 * n / mean_n) AS BIGINT) AS skew_x_milli
    FROM c, m
    ORDER BY n DESC, key
    LIMIT 10
    """,
)
def diag_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis — the report you run BEFORE a big join to
    decide between AQE skew handling, salting, or a broadcast: the 10
    heaviest o_custkey values with their multiplicity as a multiple of the
    mean key weight. One partially-aggregated count, a broadcast scalar
    mean, and a TakeOrderedAndProject cut — never a global sort, never a
    collect of the key histogram."""
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    m = c.agg(
        (F.sum("n") * F.lit(1.0) / F.count(F.lit(1))).alias("mean_n")
    )
    return (
        c.crossJoin(F.broadcast(m))
        .select(
            "key",
            "n",
            F.floor(F.lit(1000.0) * F.col("n") / F.col("mean_n"))
            .cast("bigint")
            .alias("skew_x_milli"),
        )
        .orderBy(F.desc("n"), "key")
        .limit(10)
    )


@query(
    "customer_rfm_segments",
    oracle="""
    WITH ref AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS ref_d FROM orders),
    cust AS (
        SELECT o_custkey AS custkey,
               CAST(ref.ref_d - MAX(CAST(o_orderdate AS DATE)) AS BIGINT)
                   AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders, ref GROUP BY o_custkey, ref.ref_d
    ),
    qs AS (
        SELECT
            (SELECT v FROM (SELECT recency_days AS v,
                row_number() OVER (ORDER BY recency_days, custkey) AS rn,
                COUNT(*) OVER () AS n FROM cust) WHERE rn = (n + 3) // 4) AS r1,
            (SELECT v FROM (SELECT recency_days AS v,
                row_number() OVER (ORDER BY recency_days, custkey) AS rn,
                COUNT(*) OVER () AS n FROM cust) WHERE rn = (n + 1) // 2) AS r2,
            (SELECT v FROM (SELECT recency_days AS v,
                row_number() OVER (ORDER BY recency_days, custkey) AS rn,
                COUNT(*) OVER () AS n FROM cust) WHERE rn = (3 * n + 3) // 4) AS r3,
            (SELECT v FROM (SELECT frequency AS v,
                row_number() OVER (ORDER BY frequency, custkey) AS rn,
                COUNT(*) OVER () AS n FROM cust) WHERE rn = (n + 3) // 4) AS f1,
            (SELECT v FROM (SELECT frequency AS v,
                row_number() OVER (ORDER BY frequency, custkey) AS rn,
                COUNT(*) OVER () AS n FROM cust) WHERE rn = (n + 1) // 2) AS f2,
            (SELECT v FROM (SELECT frequency AS v,
                row_number() OVER (ORDER BY frequency, custkey) AS rn,
                COUNT(*) OVER () AS n FROM cust) WHERE rn = (3 * n + 3) // 4) AS f3,
            (SELECT v FROM (SELECT monetary_cents AS v,
                row_number() OVER (ORDER BY monetary_cents, custkey) AS rn,
                COUNT(*) OVER () AS n FROM cust) WHERE rn = (n + 3) // 4) AS m1,
            (SELECT v FROM (SELECT monetary_cents AS v,
                row_number() OVER (ORDER BY monetary_cents, custkey) AS rn,
                COUNT(*) OVER () AS n FROM cust) WHERE rn = (n + 1) // 2) AS m2,
            (SELECT v FROM (SELECT monetary_cents AS v,
                row_number() OVER (ORDER BY monetary_cents, custkey) AS rn,
                COUNT(*) OVER () AS n FROM cust) WHERE rn = (3 * n + 3) // 4) AS m3
    )
    SELECT c.custkey, c.recency_days, c.frequency, c.monetary_cents,
           CAST(4 - ((c.recency_days > qs.r1)::INT + (c.recency_days > qs.r2)::INT
                     + (c.recency_days > qs.r3)::INT) AS BIGINT) AS r_score,
           CAST(1 + (c.frequency > qs.f1)::INT + (c.frequency > qs.f2)::INT
                  + (c.frequency > qs.f3)::INT AS BIGINT) AS f_score,
           CAST(1 + (c.monetary_cents > qs.m1)::INT + (c.monetary_cents > qs.m2)::INT
                  + (c.monetary_cents > qs.m3)::INT AS BIGINT) AS m_score
    FROM cust c CROSS JOIN qs
    ORDER BY c.custkey
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency (days since last order, vs the
    corpus max date), frequency (order count), monetary (exact integer
    cents), each scored 1-4 against DISCRETE quartile thresholds (the
    integer-rank elements at ceil(n/4), ceil(n/2), ceil(3n/4) — the
    winsorize discipline, so no interpolated boundary and no float sums).
    The quartiles come from three windows over the customer AGGREGATE
    (|customers| rows, not the fact table); at larger scales the exact
    thresholds relax to approx_percentile without changing the contract
    shape."""
    o = load_table(spark, sf_dir, "orders")
    ref = o.agg(F.max(F.to_date("o_orderdate")).alias("ref_d"))
    cust = (
        o.crossJoin(F.broadcast(ref))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.first("ref_d"), F.max(F.to_date("o_orderdate")))
            .cast("bigint")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("monetary_cents"),
        )
    )
    from datapipelines_spark.functions.caching import managed_persist

    cust = managed_persist(cust)

    def quartiles(col: str):
        w = Window.orderBy(F.col(col), F.col("custkey"))
        r = cust.select(
            F.col(col).alias("v"),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        return r.agg(
            F.max(F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("v"))).alias("q1"),
            F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("v"))).alias("q2"),
            F.max(F.when(F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("v"))).alias("q3"),
        )

    rq = quartiles("recency_days").select(
        F.col("q1").alias("r1"), F.col("q2").alias("r2"), F.col("q3").alias("r3")
    )
    fq = quartiles("frequency").select(
        F.col("q1").alias("f1"), F.col("q2").alias("f2"), F.col("q3").alias("f3")
    )
    mq = quartiles("monetary_cents").select(
        F.col("q1").alias("m1"), F.col("q2").alias("m2"), F.col("q3").alias("m3")
    )
    qs = F.broadcast(rq.crossJoin(fq).crossJoin(mq))

    def above(c, a, b, d):
        return (
            (F.col(c) > F.col(a)).cast("int")
            + (F.col(c) > F.col(b)).cast("int")
            + (F.col(c) > F.col(d)).cast("int")
        )

    return (
        cust.crossJoin(qs)
        .select(
            "custkey",
            "recency_days",
            "frequency",
            "monetary_cents",
            (F.lit(4) - above("recency_days", "r1", "r2", "r3"))
            .cast("bigint")
            .alias("r_score"),
            (F.lit(1) + above("frequency", "f1", "f2", "f3"))
            .cast("bigint")
            .alias("f_score"),
            (F.lit(1) + above("monetary_cents", "m1", "m2", "m3"))
            .cast("bigint")
            .alias("m_score"),
        )
        .orderBy("custkey")
    )
