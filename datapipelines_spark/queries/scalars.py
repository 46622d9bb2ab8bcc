"""Scalar function catalog: string / date / math / conditional / JSON.

The reference's only scalar surface is arbitrary Python lambdas (M2
LambdaMapper, /root/reference/sdata/mappers/base.py:40-67); here every scalar
stays a Catalyst expression inside whole-stage codegen — the 10-100× "UDFs
are the slow path" rule applied at the catalog level.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipelines_spark.catalog import query
from datapipelines_spark.sources.parquet import load_table


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                       AS name_upper,
           LOWER(p_brand)                      AS brand_lower,
           substr(p_name, 1, 5)                AS name_prefix,
           length(p_name)                      AS name_len,
           concat(p_brand, ':', p_type)        AS brand_type,
           replace(p_type, 'ECONOMY', 'ECON')  AS type_short,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           trim('  pad  ')                     AS trimmed,
           CASE WHEN p_name LIKE '%an%' THEN 1 ELSE 0 END AS has_an,
           split_part(p_type, ' ', 1)          AS type_first_word
    FROM part
    ORDER BY p_partkey
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar catalog: case, substring, length, concat, replace, pad,
    trim, LIKE, split."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECON")).alias("type_short"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.when(F.col("p_name").like("%an%"), 1).otherwise(0).cast("int").alias("has_an"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
    ).orderBy("p_partkey")


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)     AS order_year,
           CAST(month(o_orderdate) AS INTEGER)    AS order_month,
           CAST(day(o_orderdate) AS INTEGER)      AS order_day,
           CAST(dayofweek(o_orderdate) AS INTEGER) + 1 AS order_dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS due_ts,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER)
               AS days_to_2002,
           strftime(o_orderdate, '%Y-%m')         AS order_ym
    FROM orders
    ORDER BY o_orderkey
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar catalog: extract, trunc, arithmetic, diff, format.

    DuckDB's dayofweek is 0=Sunday while Spark's dayofweek is 1=Sunday; the
    oracle adds 1 to align.
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.dayofweek(d).alias("order_dow"),
        F.date_trunc("month", d).alias("month_start"),
        F.date_add(d.cast("date"), 90).cast("timestamp_ntz").alias("due_ts"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).alias("days_to_2002"),
        F.date_format(d, "yyyy-MM").alias("order_ym"),
    ).orderBy("o_orderkey")


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1)        AS price_round,
           CAST(ceil(l_discount * 100) AS BIGINT)  AS disc_ceil_pct,
           CAST(floor(l_tax * 100) AS BIGINT)      AS tax_floor_pct,
           abs(l_quantity - 25.0)           AS qty_dev,
           round(sqrt(l_extendedprice), 6)  AS price_sqrt,
           round(ln(l_extendedprice + 1), 6) AS price_ln,
           round(power(1 + l_tax, 2), 9)    AS tax_compound,
           CAST(l_quantity AS BIGINT) % 7   AS qty_mod7,
           greatest(l_discount, l_tax)      AS max_rate,
           least(l_discount, l_tax)         AS min_rate
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar catalog: round/ceil/floor/abs/sqrt/ln/pow/mod/greatest."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_round"),
        F.ceil(F.col("l_discount") * 100).alias("disc_ceil_pct"),
        F.floor(F.col("l_tax") * 100).alias("tax_floor_pct"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 9).alias("tax_compound"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "scalar_conditional_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'partial' END    AS status_word,
           CASE WHEN o_totalprice >= 200000 THEN 'large'
                WHEN o_totalprice >= 50000  THEN 'medium'
                ELSE 'small' END                    AS size_bucket,
           COALESCE(NULLIF(o_orderpriority, '3-MEDIUM'), 'default') AS priority_or_default,
           CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS closed_price
    FROM orders
    ORDER BY o_orderkey
    """,
)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / multi-branch WHEN / COALESCE / NULLIF."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_word"),
        F.when(F.col("o_totalprice") >= 200000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("size_bucket"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")), F.lit("default")).alias(
            "priority_or_default"
        ),
        F.when(F.col("o_orderstatus") == "O", F.lit(None)).otherwise(F.col("o_totalprice")).alias(
            "closed_price"
        ),
    ).orderBy("o_orderkey")


@query(
    "scalar_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS prop_k_mod10
    FROM events
    ORDER BY event_id
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column (C1 decode parity for the
    reference's ``json`` members — /root/reference/sdata/datapipeline.py:525
    decodes JSON payloads; relationally that's get_json_object/from_json)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.select(
        "event_id",
        k.alias("prop_k"),
        (k % 10).alias("prop_k_mod10"),
    ).orderBy("event_id")


@query(
    "scalar_fuzzy_string",
    oracle="""
    SELECT n_nationkey,
           levenshtein(n_name, 'GERMANY') AS dist_germany,
           CASE WHEN levenshtein(n_name, 'GERMANY') <= 3 THEN 1 ELSE 0 END AS near_germany,
           CAST(length(n_name) AS BIGINT) AS name_len
    FROM nation
    ORDER BY n_nationkey
    """,
)
def scalar_fuzzy_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: Levenshtein edit distance (typo-tolerant
    entity matching, a standard data-cleaning scalar)."""
    n = load_table(spark, sf_dir, "nation")
    dist = F.levenshtein(F.col("n_name"), F.lit("GERMANY"))
    return n.select(
        "n_nationkey",
        dist.alias("dist_germany"),
        F.when(dist <= 3, 1).otherwise(0).cast("int").alias("near_germany"),
        F.length("n_name").cast("bigint").alias("name_len"),
    ).orderBy("n_nationkey")


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding)                                             AS dim,
           round(list_aggregate(embedding::DOUBLE[], 'sum'), 5)       AS vec_sum,
           round(list_aggregate(embedding::DOUBLE[], 'max'), 6)       AS vec_max,
           round(list_aggregate(embedding::DOUBLE[], 'min'), 6)       AS vec_min,
           round(CAST(embedding[1] AS DOUBLE), 6)                     AS first_elem,
           len(list_filter(embedding, x -> x > 0))                    AS n_positive
    FROM embeddings WHERE embedding IS NOT NULL
    ORDER BY vec_id
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order functions over the embedding column — the engine's
    native representation for tensor-valued sample members (SURVEY §1.4) —
    over rows WITH a vector (size(NULL) is session-conf-dependent)."""
    e = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    vec = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(vec).cast("bigint").alias("dim"),
        F.round(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x), 5).alias("vec_sum"),
        F.round(F.array_max(vec).cast("double"), 6).alias("vec_max"),
        F.round(F.array_min(vec).cast("double"), 6).alias("vec_min"),
        F.round(F.element_at(vec, 1).cast("double"), 6).alias("first_elem"),
        F.size(F.filter(vec, lambda x: x > 0)).cast("bigint").alias("n_positive"),
    ).orderBy("vec_id")


@query(
    "scalar_from_json_typed",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
           to_json(json_object('k', CAST(json_extract(props, '$.k') AS BIGINT) * 2))
               AS doubled_json
    FROM events
    ORDER BY event_id
    """,
)
def scalar_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON round-trip IN-PLAN: ``from_json`` parses the props string
    into a typed struct (not string extraction — a schema'd parse, the
    relational form of the reference's json decode handler,
    /root/reference/sdata/datapipeline.py:525), and ``to_json`` re-emits a
    transformed struct. Both are codegen'd Catalyst expressions — zero
    Python."""
    from pyspark.sql import types as T

    e = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = F.from_json(F.col("props"), schema)
    return e.select(
        "event_id",
        parsed["k"].alias("k_typed"),
        # ignoreNullFields=false: a null k must serialize as {"k":null}
        # (SQL json_object semantics), not silently vanish into {}
        F.to_json(
            F.struct((parsed["k"] * 2).alias("k")),
            {"ignoreNullFields": "false"},
        ).alias("doubled_json"),
    ).orderBy("event_id")


@query(
    "scalar_map_hof_funcs",
    oracle="""
    SELECT o_custkey, o_orderstatus AS status, COUNT(*) * 2 AS n2
    FROM orders
    GROUP BY o_custkey, o_orderstatus
    HAVING COUNT(*) * 2 >= 4
    ORDER BY o_custkey, status
    """,
)
def scalar_map_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order MAP functions in-plan: per-customer status->count maps
    built with map_from_entries, then transform_values (double each count)
    and map_filter (keep entries >= 4), exploded back to rows. The detour
    through map construction/transformation/filtering must round-trip to
    the plain relational answer — all codegen'd/interpreted JVM
    expressions, zero Python."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey", "o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    m = per.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("o_orderstatus"), F.col("n")))
        ).alias("m")
    )
    doubled = F.transform_values(F.col("m"), lambda k, v: v * 2)
    kept = F.map_filter(doubled, lambda k, v: v >= 4)
    return (
        m.select("o_custkey", F.explode(kept).alias("status", "n2"))
        .orderBy("o_custkey", "status")
    )
