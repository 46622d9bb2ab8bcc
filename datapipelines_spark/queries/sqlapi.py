"""SQL entry point: queries expressed as ``spark.sql`` over registered views
(SURVEY §7.3 — the free third entry point next to the DataFrame API and the
config builder). The SQL strings are dialect-shared: the same text runs on
Spark and DuckDB, so the oracle IS the query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datapipelines_spark.catalog import query
from datapipelines_spark.sources.parquet import register_views

_Q6 = """
SELECT SUM(l_extendedprice * l_discount) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

_TOP_CUSTOMERS = """
SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
       SUM(o.o_totalprice) AS total_spend,
       COUNT(*) AS n_orders
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY total_spend DESC, c_custkey
LIMIT 20
"""

_REVENUE_BY_MONTH = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       SUM(o_totalprice) AS revenue,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1, 2
ORDER BY yr, mo
"""


def _sql_builder(sql: str):
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return build


query("sql_q6_forecast_revenue", oracle=_Q6, doc="TPC-H Q6 shape via the SQL entry point")(
    _sql_builder(_Q6)
)
query("sql_top_customers", oracle=_TOP_CUSTOMERS, doc="join+agg+top-k via the SQL entry point")(
    _sql_builder(_TOP_CUSTOMERS)
)
query(
    "sql_revenue_by_month", oracle=_REVENUE_BY_MONTH, doc="date rollup via the SQL entry point"
)(_sql_builder(_REVENUE_BY_MONTH))

_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""

query(
    "sql_grouping_sets_mixed",
    oracle=_GROUPING_SETS,
    doc="arbitrary GROUPING SETS (two one-column sets + grand total) via the "
    "SQL entry point — complements rollup/cube/GROUPING() coverage",
)(_sql_builder(_GROUPING_SETS))

_LATERAL_TOP2 = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
"""

query(
    "sql_lateral_top2_orders",
    oracle=_LATERAL_TOP2,
    doc="correlated LATERAL subquery join with per-row ORDER BY + LIMIT "
    "(top-2 orders per customer) — dialect-shared SQL; Spark plans it as a "
    "ranked lateral join, the window-free way to express per-key top-k",
)(_sql_builder(_LATERAL_TOP2))


_RECURSIVE_CHAIN = """
WITH RECURSIVE edges AS (
    SELECT n_regionkey AS region, n_nationkey AS src,
           LEAD(n_nationkey) OVER (PARTITION BY n_regionkey
                                   ORDER BY n_nationkey) AS dst
    FROM nation
),
roots AS (
    SELECT n_regionkey AS region, MIN(n_nationkey) AS node
    FROM nation GROUP BY n_regionkey
),
walk AS (
    SELECT region, node, 0 AS depth FROM roots
    UNION ALL
    SELECT w.region, e.dst AS node, w.depth + 1 AS depth
    FROM walk w JOIN edges e ON e.src = w.node AND e.region = w.region
    WHERE e.dst IS NOT NULL
)
SELECT region, node, depth FROM walk ORDER BY region, depth
"""

query(
    "sql_recursive_region_chain",
    oracle=_RECURSIVE_CHAIN,
    doc="WITH RECURSIVE graph walk: per-region nation chains (edges from a "
    "window LEAD), walked from each region's root to compute depth — the "
    "iterative-closure shape (org hierarchies, duplicate clusters) expressed "
    "in pure shared-dialect SQL; Spark 4 and DuckDB both execute the "
    "identical text.",
)(_sql_builder(_RECURSIVE_CHAIN))


_EXISTS_CORRELATED = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
          AND o.o_totalprice < 50000
      )
ORDER BY c_custkey
"""

query(
    "sql_exists_correlated",
    oracle=_EXISTS_CORRELATED,
    doc="Correlated EXISTS / NOT EXISTS at the SQL surface (planned as "
    "semi/anti joins by Catalyst): customers with a big order and no small "
    "finished one.",
)(_sql_builder(_EXISTS_CORRELATED))
