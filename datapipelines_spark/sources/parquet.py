"""Parquet table sources for the fixture star schema (TESTDATA.md).

Scans are plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown,
column pruning and partition pruning. At 100 TB these tables would be
directory-partitioned; nothing here assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale factor —
#: at TPC-H geometry, region=5 and nation=25 rows regardless of SF; supplier
#: and part grow linearly but stay far below lineitem/orders. Join helpers use
#: this to pick broadcast sides.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. ``sf_dir`` like ``/root/testdata/sf0.01``.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    rejects; we read it as int64 (``nanosAsLong``) and truncate to microsecond
    ``timestamp_ntz`` — the same floor-to-micros DuckDB applies when coercing
    TIMESTAMP_NS to its microsecond TIMESTAMP, so both engines see identical
    values. The conf is set at runtime so this works under any caller-provided
    SparkSession (e.g. the driver's).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(df.schema["ts"].dataType, T.LongType):
        # Integer division: nanos ~1.7e18 exceed double precision (2^53), so
        # `/ 1000` through double would be off by ±1 µs on some rows.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL entry point."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
