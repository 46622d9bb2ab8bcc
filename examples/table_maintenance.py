"""Table maintenance on plain parquet: keyed corrections, validation,
compaction — the metadata-table workflow a corpus pipeline runs beside its
document shards.

base load -> upsert corrections (merge-on-read deltas) -> tombstone bad
rows -> validate the snapshot with single-pass constraint checks ->
compact history back to a plain scan.

Run:  python examples/table_maintenance.py [sf_dir]  (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelines_spark.operators.checks import (
    accepted_values,
    bounds,
    check_constraints,
    completeness,
    uniqueness,
)
from datapipelines_spark.session import get_spark
from datapipelines_spark.sinks.upsert import compact, read_merged, upsert_write
from datapipelines_spark.sources.parquet import load_table


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="table_maintenance", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    path = tempfile.mkdtemp(prefix="orders_tbl_")
    shutil.rmtree(path)

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    v0 = upsert_write(orders, path)
    print(f"base version v={v0}: {read_merged(spark, path, ['o_orderkey']).count()} rows")

    # late corrections arrive: restate a slice of prices
    v1 = upsert_write(
        orders.where(F.col("o_orderkey") % 10 == 0).withColumn(
            "o_totalprice", F.round(F.col("o_totalprice") * 1.05, 2)
        ),
        path,
    )
    # and tombstone rows a quality audit rejected
    v2 = upsert_write(
        orders.where(F.col("o_orderkey") % 17 == 0), path, delete=True
    )
    snap = read_merged(spark, path, ["o_orderkey"])
    print(f"after deltas v={v1},{v2}: {snap.count()} rows")

    # validate the live snapshot in ONE aggregate pass
    report = check_constraints(
        snap,
        [
            completeness("o_custkey", 1.0),
            uniqueness("o_orderkey"),
            bounds("o_totalprice", 0, 1_000_000),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
        ],
    )
    report.show(truncate=False)
    assert all(r["passed"] for r in report.collect()), "validation failed"

    # fold history: reads return to a plain single-directory scan
    vc = compact(spark, path, ["o_orderkey"])
    print(f"compacted to v={vc}: {read_merged(spark, path, ['o_orderkey']).count()} rows")
    shutil.rmtree(path)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
