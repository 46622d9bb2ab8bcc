"""Advanced relational coverage: as-of join, range (non-equi) join, pivot,
percentiles/statistics, string aggregation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipelines_spark.catalog import query
from datapipelines_spark.sources.parquet import load_table


@query(
    "asof_join_last_order_before_event",
    oracle="""
    WITH ranked AS (
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderkey, o.o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, ts,
           o_orderkey AS last_orderkey, o_totalprice AS last_totalprice
    FROM ranked WHERE rn = 1
    ORDER BY event_id
    """,
)
def asof_join_last_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join: each event picks the user's most recent
    order at-or-before the event time.

    Implemented with the union+carry-forward operator (operators/asof.py):
    one shuffle on the key, no range-join explosion — at 100 TB this is a
    sort-merge pass, while the oracle's inequality-join formulation would
    materialize every (event, earlier-order) pair.

    Tiebreak note: at equal o_orderdate the carry-forward keeps the row that
    sorts last; the oracle mirrors that with ORDER BY ... o_orderkey DESC.
    """
    from datapipelines_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    # at equal timestamps, later orderkey wins (deterministic carry-forward)
    ).orderBy("o_orderdate", "last_orderkey")
    out = asof_join(
        e,
        o,
        key="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["last_orderkey", "last_totalprice"],
    )
    return out.select("event_id", "user_id", "ts", "last_orderkey", "last_totalprice").orderBy(
        "event_id"
    )


@query(
    "range_join_price_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('budget', 0.0, 930.0), ('mid', 930.0, 970.0), ('premium', 970.0, 100000.0)
    )
    SELECT b.band, COUNT(*) AS n_parts, AVG(p.p_retailprice) AS avg_price
    FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band ORDER BY b.band
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a tiny banding dimension — broadcast the
    band table so the theta-join is a map-side interval probe, never a
    shuffle."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 930.0), ("mid", 930.0, 970.0), ("premium", 970.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.avg("p_retailprice").alias("avg_price"),
        )
        .orderBy("band")
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COALESCE(SUM(o_totalprice) FILTER (o_orderstatus = 'F'), 0.0) AS total_F,
           COALESCE(SUM(o_totalprice) FILTER (o_orderstatus = 'O'), 0.0) AS total_O,
           COALESCE(SUM(o_totalprice) FILTER (o_orderstatus = 'P'), 0.0) AS total_P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order totals spread across status columns (explicit value list
    keeps the plan single-pass; without it Spark needs a distinct-values
    pre-query)."""
    o = load_table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("total_F"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("total_O"),
        F.coalesce(F.col("P"), F.lit(0.0)).alias("total_P"),
    ).orderBy("o_orderpriority")


@query(
    "percentile_order_values",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 6)  AS p50,
           round(quantile_cont(o_totalprice, 0.9), 6)  AS p90,
           round(quantile_cont(o_totalprice, 0.99), 6) AS p99,
           round(stddev_samp(o_totalprice), 6) AS sd,
           round(avg(o_totalprice), 6) AS mean
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def percentile_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles + dispersion statistics per group."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90"),
            F.round(F.percentile("o_totalprice", F.lit(0.99)), 6).alias("p99"),
            F.round(F.stddev_samp("o_totalprice"), 6).alias("sd"),
            F.round(F.avg("o_totalprice"), 6).alias("mean"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "corr_discount_quantity",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_discount, l_quantity), 6) AS corr_dq,
           round(covar_pop(l_discount, l_quantity), 6) AS covar_dq,
           round(var_samp(l_discount), 9) AS var_disc
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def corr_discount_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (corr / covariance / variance) per group."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_discount", "l_quantity"), 6).alias("corr_dq"),
            F.round(F.covar_pop("l_discount", "l_quantity"), 6).alias("covar_dq"),
            F.round(F.var_samp("l_discount"), 9).alias("var_disc"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "string_agg_nation_names",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def string_agg_nation_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (collect → sort → join) per group."""
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "agg_approx_percentile_contract",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_disc(o_totalprice, 0.5), 6) AS p50_exact,
           round(quantile_disc(o_totalprice, 0.9), 6) AS p90_exact,
           TRUE AS approx_within_1pct
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_approx_percentile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna sketch): like the HLL query, the
    sketch is engine-specific so the oracle contract is accuracy, not
    equality — exact discrete percentiles plus a flag asserting the sketch
    landed within 1% relative error. At 100 TB the sketch is the only
    option: fixed memory per group vs an exact percentile's full sort."""
    o = load_table(spark, sf_dir, "orders")
    approx = F.percentile_approx("o_totalprice", F.array(F.lit(0.5), F.lit(0.9)), 10_000)
    exact50 = F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
    exact90 = F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(exact50, 6).alias("p50_exact"),
            F.round(exact90, 6).alias("p90_exact"),
            approx.alias("__ap"),
        )
        .select(
            "o_orderstatus",
            "p50_exact",
            "p90_exact",
            (
                (F.abs(F.col("__ap")[0] - F.col("p50_exact")) <= 0.01 * F.col("p50_exact"))
                & (F.abs(F.col("__ap")[1] - F.col("p90_exact")) <= 0.01 * F.col("p90_exact"))
            ).alias("approx_within_1pct"),
        )
        .orderBy("o_orderstatus")
    )


def _pagerank_iter_sql(prev: str, this: str) -> str:
    """One unrolled PageRank iteration as a DuckDB CTE (fixed-iteration
    power method: no aggregation-in-recursion needed)."""
    return f"""
    {this} AS (
        SELECT nd.node,
               CAST(CAST(ROUND((1.0 - 0.85) / (SELECT n FROM nn), 9)
                         AS DECIMAL(18,9))
                    + COALESCE(SUM(x.c), CAST(0 AS DECIMAL(18,9)))
                    AS DECIMAL(18,9)) AS rank
        FROM nodes nd LEFT JOIN (
            SELECT e.dst AS node,
                   CAST(ROUND(0.85 * CAST(r.rank AS DOUBLE) * (e.w / o.outw), 9)
                        AS DECIMAL(18,9)) AS c
            FROM edges e
            JOIN outw o USING (src)
            JOIN {prev} r ON r.node = e.src
        ) x ON x.node = nd.node
        GROUP BY nd.node
    )"""


@query(
    "graph_pagerank_trade",
    oracle=f"""
    WITH edges AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               CAST(COUNT(*) AS DOUBLE) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    outw AS (SELECT src, SUM(w) AS outw FROM edges GROUP BY 1),
    nodes AS (
        SELECT DISTINCT src AS node FROM edges
        UNION SELECT DISTINCT dst FROM edges
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (
        SELECT node,
               CAST(ROUND(1.0 / (SELECT n FROM nn), 9) AS DECIMAL(18,9)) AS rank
        FROM nodes
    ),{_pagerank_iter_sql("r0", "r1")},{_pagerank_iter_sql("r1", "r2")},{_pagerank_iter_sql("r2", "r3")}
    SELECT n.n_name AS nation, CAST(r.rank AS DOUBLE) AS rank
    FROM r3 r JOIN nation n ON n.n_nationkey = r.node
    ORDER BY rank DESC, nation
    """,
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph analytics beyond connected components: 3 iterations
    of weighted PageRank over the nation-level trade graph (supplier nation
    → customer nation, edge weight = lineitem count). The engine runs the
    generic iterative operator (operators/components.py:pagerank — one
    groupBy(dst) shuffle per iteration, decimal-exact arithmetic); the
    oracle unrolls the same three iterations as CTEs. Ranks reproduce
    bit-for-bit because every contribution is rounded to 9 decimals before
    summation."""
    from datapipelines_spark.operators.components import pagerank

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    ranks = pagerank(edges, "src", "dst", "weight", damping=0.85, iterations=3)
    return (
        ranks.join(F.broadcast(n), ranks.node == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.col("rank").cast("double").alias("rank"))
        .orderBy(F.desc("rank"), "nation")
    )


@query(
    "graph_triangle_interactions",
    oracle="""
    WITH e AS (
        SELECT DISTINCT a.user_id AS u, b.user_id AS v
        FROM events a JOIN events b
          ON date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
         AND minute(a.ts) // 5 = minute(b.ts) // 5
         AND a.event_type = b.event_type
         AND a.user_id < b.user_id
    ),
    t AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (
        SELECT a AS node FROM t
        UNION ALL SELECT b FROM t
        UNION ALL SELECT c FROM t
    )
    GROUP BY node ORDER BY node
    """,
)
def graph_triangle_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts (operators/components.py:triangle_counts,
    degree-ordered compact-forward enumeration — wedge fan-out bounded by
    the max ORIENTED out-degree, O(sqrt(m)) on skewed graphs) over the
    user-interaction graph: users co-active in the same 5-minute bucket
    with the same event type. The oracle enumerates a<b<c triangles with a
    plain 3-way self-join; both sides must agree node-for-node."""
    from datapipelines_spark.operators.components import triangle_counts

    # ts is TIMESTAMP_NTZ: bucket with timezone-free date parts (hour
    # truncation + 5-minute sub-bucket), identical in Spark and DuckDB
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket_hour"),
        F.floor(F.minute(F.col("ts")) / 5).alias("bucket_5m"),
    )
    a = ev.select(
        F.col("user_id").alias("ua"), "event_type", "bucket_hour", "bucket_5m"
    )
    b = ev.select(
        F.col("user_id").alias("ub"), "event_type", "bucket_hour", "bucket_5m"
    )
    edges = (
        a.join(b, ["bucket_hour", "bucket_5m", "event_type"])
        .where(F.col("ua") < F.col("ub"))
        .select(F.col("ua").alias("src"), F.col("ub").alias("dst"))
        .distinct()
    )
    return triangle_counts(edges).orderBy("node")


@query(
    "incremental_revenue_by_month",
    oracle="""
    SELECT month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
    FROM (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               o_totalprice
        FROM orders
        WHERE NOT (o_orderdate < DATE '1997-01-01' AND o_orderkey % 13 = 0)
    )
    GROUP BY month
    ORDER BY month
    """,
)
def incremental_revenue_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance
    (operators/incremental.py): the monthly revenue rollup is built as a
    partial-aggregate STATE over the pre-1997 slice, then brought current
    by merging ONE delta that both inserts the 1997+ orders and RETRACTS
    the %13 pre-1997 orders (an upstream correction) — the base slice is
    never rescanned. The oracle recomputes the final view directly, so the
    state+delta merge must equal the full recompute exactly (decimal
    accumulators make the merge order-independent). Scale shape: the merge
    shuffle carries O(#months) state rows + the delta's groups."""
    from datapipelines_spark.operators.incremental import (
        aggregate_state,
        merge_states,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.trunc(F.col("o_orderdate"), "month").alias("month"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate"),
        F.col("o_orderkey"),
    )
    base = orders.where(F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    state = aggregate_state(base, ["month"], ["price"])
    delta = (
        orders.where(F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        .withColumn("__retract", F.lit(False))
        .unionByName(
            base.where(F.col("o_orderkey") % 13 == 0).withColumn(
                "__retract", F.lit(True)
            )
        )
    )
    delta_state = aggregate_state(delta, ["month"], ["price"], retract_col="__retract")
    return (
        merge_states(state, delta_state, ["month"])
        .select(
            "month",
            F.col("__cnt").alias("n_orders"),
            F.col("sum_price").cast("double").alias("revenue"),
        )
        .orderBy("month")
    )


@query(
    "incremental_distinct_customers",
    oracle="""
    SELECT month,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               o_custkey
        FROM orders
        WHERE NOT (o_orderdate < DATE '1997-01-01' AND o_orderkey % 13 = 0)
    )
    GROUP BY month
    ORDER BY month
    """,
)
def incremental_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental COUNT(DISTINCT) maintenance
    (operators/incremental.py:distinct_state/distinct_view) — the classic
    non-distributive aggregate, maintained EXACTLY by keeping signed
    multiplicities per (month, customer): the pre-1997 slice builds the
    auxiliary state, ONE delta inserts the 1997+ orders and retracts the
    %13 pre-1997 orders (an upstream correction), and a customer's month
    membership survives exactly while some order still supports it —
    partially-retracted customers must NOT vanish, fully-retracted ones
    must. The oracle recomputes distinct customers per month directly;
    the merge never rescans the base slice and shuffles only
    O(#surviving (month, customer) pairs)."""
    from datapipelines_spark.operators.incremental import (
        distinct_state,
        distinct_view,
        merge_states,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.trunc(F.col("o_orderdate"), "month").alias("month"),
        F.col("o_custkey"),
        F.col("o_orderdate"),
        F.col("o_orderkey"),
    )
    base = orders.where(F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    state = distinct_state(base, ["month"], "o_custkey")
    delta = (
        orders.where(F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        .withColumn("__retract", F.lit(False))
        .unionByName(
            base.where(F.col("o_orderkey") % 13 == 0).withColumn(
                "__retract", F.lit(True)
            )
        )
    )
    delta_state = distinct_state(delta, ["month"], "o_custkey", retract_col="__retract")
    merged = merge_states(state, delta_state, ["month", "o_custkey"])
    return (
        distinct_view(merged, ["month"])
        .select("month", F.col("n_distinct").alias("n_customers"))
        .orderBy("month")
    )


@query(
    "incremental_minmax_order_price",
    oracle="""
    SELECT month,
           MIN(cents) AS min_cents,
           MAX(cents) AS max_cents
    FROM (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
        WHERE NOT (o_orderdate < DATE '1997-01-01' AND o_orderkey % 13 = 0)
    )
    GROUP BY month
    ORDER BY month
    """,
)
def incremental_minmax_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact incremental MIN/MAX under retractions
    (operators/incremental.py:extreme_view) — the other classically
    non-distributive aggregate: a scalar max cannot forget a deleted
    extreme, but the signed-multiplicity (month, price) state knows the
    runner-up. Same construction as incremental_distinct_customers: the
    pre-1997 slice builds the state, ONE delta inserts 1997+ orders and
    retracts the %13 pre-1997 orders; months whose extreme order was
    retracted must fall back to the surviving runner-up. The oracle
    recomputes extremes directly; the merge shuffles O(#surviving
    (month, price) pairs), never the base slice."""
    from datapipelines_spark.operators.incremental import (
        distinct_state,
        extreme_view,
        merge_states,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.trunc(F.col("o_orderdate"), "month").alias("month"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        F.col("o_orderdate"),
        F.col("o_orderkey"),
    )
    base = orders.where(F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    state = distinct_state(base, ["month"], "cents")
    delta = (
        orders.where(F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        .withColumn("__retract", F.lit(False))
        .unionByName(
            base.where(F.col("o_orderkey") % 13 == 0).withColumn(
                "__retract", F.lit(True)
            )
        )
    )
    delta_state = distinct_state(delta, ["month"], "cents", retract_col="__retract")
    merged = merge_states(state, delta_state, ["month", "cents"])
    return extreme_view(merged, ["month"], "cents").orderBy("month")
