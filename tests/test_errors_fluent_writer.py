"""Error-handling modes, fluent verbs, dummy dataset, writers."""

import pyspark.sql.functions as F
import pytest

from datapipelines_spark.operators import errors, fluent
from datapipelines_spark.sinks.writer import write_dataset, write_sample_shards


@pytest.fixture()
def dirty_df(spark):
    # B2-style error-injection fixture: some unparseable json, some nulls
    rows = [
        ("k1", '{"h": 4}'),
        ("k2", "NOT JSON {{{"),
        ("k3", None),
        ("k4", '{"h": 9}'),
    ]
    return spark.createDataFrame(rows, "`__key__` string, json string")


class TestPermissiveErrors:
    def test_permissive_decode_then_drop(self, dirty_df):
        decoded = errors.permissive_from_json(dirty_df, "json", "h int")
        assert decoded.count() == 4  # decode never throws
        kept = errors.drop_failed(decoded, ["json"])
        assert sorted(r["__key__"] for r in kept.collect()) == ["k1", "k4"]

    def test_quarantine_names_failed_columns(self, dirty_df):
        decoded = errors.permissive_from_json(dirty_df, "json", "h int")
        good, bad = errors.quarantine(decoded, ["json"])
        assert sorted(r["__key__"] for r in good.collect()) == ["k1", "k4"]
        bad_rows = {r["__key__"]: r["__failed_columns"] for r in bad.collect()}
        assert bad_rows == {"k2": ["json"], "k3": ["json"]}

    def test_observed_counts_drops(self, dirty_df):
        decoded = errors.permissive_from_json(dirty_df, "json", "h int")
        observed, obs = errors.observed(decoded, "decode_stage", ["json"])
        observed.count()
        assert obs.get["rows_seen"] == 4
        assert obs.get["null_json"] == 2


class TestFluentVerbs:
    def test_to_tuple_and_rename(self, spark):
        df = spark.createDataFrame([(1, "a", 2.0)], "x int, y string, z double")
        out = fluent.rename(fluent.to_tuple(df, "x", "y"), key="x")
        assert out.columns == ["key", "y"]

    def test_rsample_deterministic(self, spark):
        df = spark.range(10000)
        s1 = fluent.rsample(df, 0.3, "id")
        s2 = fluent.rsample(df, 0.3, "id")
        n = s1.count()
        assert abs(n - 3000) < 300
        assert sorted(r["id"] for r in s1.collect()) == sorted(r["id"] for r in s2.collect())

    def test_slice_rows_offset(self, spark):
        df = spark.range(100)
        out = fluent.slice_rows(df, limit=10, offset=5, order_by=["id"])
        assert [r["id"] for r in out.collect()] == list(range(5, 15))

    def test_unbatch(self, spark):
        df = spark.createDataFrame([(1, [1, 2, 3])], "id int, xs array<int>")
        assert fluent.unbatch(df, "xs").count() == 3

    def test_map_dict(self, spark):
        import pyspark.sql.functions as F

        df = spark.createDataFrame([(1, "a", 2.0)], "x int, y string, z double")
        out = fluent.map_dict(df, x=lambda c: c + 10, y=F.upper(F.col("y")))
        row = out.collect()[0]
        assert (row["x"], row["y"], row["z"]) == (11, "A", 2.0)
        assert out.columns == ["x", "y", "z"]  # in-place, order preserved

    def test_with_epoch(self, spark):
        df = spark.createDataFrame([("a",), ("b",)], "k string")
        out = fluent.with_epoch(df, 3)
        assert out.count() == 6
        assert sorted(r["epoch"] for r in out.select("epoch").distinct().collect()) == [0, 1, 2]

    def test_dummy_dataset(self, spark):
        base = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
        dummy = fluent.create_dummy_dataset(base.orderBy("k"), count=1000)
        assert dummy.count() == 1000
        assert dummy.select("k").distinct().count() == 1  # single sample repeated


class TestWriters:
    def test_write_dataset_partitioned(self, spark, tmp_path):
        df = spark.range(1000).select(
            F.col("id"), (F.col("id") % 3).alias("bucket")
        )
        path = str(tmp_path / "out")
        write_dataset(df, path, partition_by=["bucket"], target_files=2, mode="overwrite")
        back = spark.read.parquet(path)
        assert back.count() == 1000
        assert back.select("bucket").distinct().count() == 3
        # partition pruning works on the layout
        pruned = back.where(F.col("bucket") == 1)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan

    def test_write_sample_shards_file_count(self, spark, tmp_path):
        import glob

        df = spark.range(2500)
        path = str(tmp_path / "shards")
        write_sample_shards(df, path, shard_rows=1000)
        files = glob.glob(f"{path}/*.parquet")
        assert len(files) == 3
        assert spark.read.parquet(path).count() == 2500
