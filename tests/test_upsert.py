"""Merge-on-read upsert sink (sinks/upsert.py): latest-wins semantics,
tombstones, compaction equivalence, and writer discipline."""

import os

import pytest

from datapipelines_spark.sinks.upsert import (
    compact,
    read_merged,
    upsert_write,
    _versions,
)


def _snapshot(spark, path):
    return {
        (r["k"],): (r["val"],)
        for r in read_merged(spark, path, ["k"]).collect()
    }


def test_upsert_latest_wins_and_tombstones(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, val string")
    assert upsert_write(base, path) == 0
    up = spark.createDataFrame([(2, "B2"), (4, "d")], "k long, val string")
    assert upsert_write(up, path) == 1
    dels = spark.createDataFrame([(3, None)], "k long, val string")
    assert upsert_write(dels, path, delete=True) == 2
    got = _snapshot(spark, path)
    assert got == {(1,): ("a",), (2,): ("B2",), (4,): ("d",)}


def test_delete_then_reinsert_resurrects(spark, tmp_path):
    path = str(tmp_path / "tbl")
    upsert_write(spark.createDataFrame([(1, "a")], "k long, val string"), path)
    upsert_write(
        spark.createDataFrame([(1, None)], "k long, val string"), path, delete=True
    )
    upsert_write(spark.createDataFrame([(1, "a3")], "k long, val string"), path)
    assert _snapshot(spark, path) == {(1,): ("a3",)}


def test_compact_preserves_snapshot_and_drops_history(spark, tmp_path):
    path = str(tmp_path / "tbl")
    upsert_write(
        spark.createDataFrame([(i, f"v{i}") for i in range(20)], "k long, val string"),
        path,
    )
    upsert_write(
        spark.createDataFrame([(5, "V5"), (7, "V7")], "k long, val string"), path
    )
    upsert_write(
        spark.createDataFrame([(9, None)], "k long, val string"), path, delete=True
    )
    before = _snapshot(spark, path)
    v = compact(spark, path, ["k"])
    assert _versions(path) == [v]
    assert _snapshot(spark, path) == before
    # table stays writable after compaction
    upsert_write(spark.createDataFrame([(5, "V5b")], "k long, val string"), path)
    assert _snapshot(spark, path)[(5,)] == ("V5b",)


def test_writes_are_immutable_versions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "k long, val string")
    v0 = upsert_write(df, path)
    v1 = upsert_write(df, path)
    assert (v0, v1) == (0, 1)
    assert _versions(path) == [0, 1]
    assert os.path.isdir(os.path.join(path, "v=0"))
