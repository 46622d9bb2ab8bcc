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
