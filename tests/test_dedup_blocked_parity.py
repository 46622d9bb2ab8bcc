"""Blocked-GEMM embedding dedup must equal the all-pairs oracle operator
exactly, and its physical plan must be shuffle+GEMM, not a nested-loop
product (VERDICT r2 #4: scale-safe default path)."""

import pyspark.sql.functions as F

from datapipelines_spark.operators.dedup import (
    embedding_cosine_pairs,
    embedding_cosine_pairs_blocked,
)
from datapipelines_spark.sources.parquet import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.select("vec_a", "vec_b", "cosine").collect())


def test_blocked_matches_allpairs(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    exact = embedding_cosine_pairs(e, "embedding", "vec_id", threshold=0.45)
    blocked = embedding_cosine_pairs_blocked(e, "embedding", "vec_id", threshold=0.45)
    assert _rows(blocked) == _rows(exact)


def test_blocked_matches_allpairs_tiny_blocks(spark, sf_dir):
    # Forcing many blocks exercises diagonal AND off-diagonal tasks plus the
    # min/max pair orientation across blocks.
    e = load_table(spark, sf_dir, "embeddings")
    exact = embedding_cosine_pairs(e, "embedding", "vec_id", threshold=0.45)
    blocked = embedding_cosine_pairs_blocked(
        e, "embedding", "vec_id", threshold=0.45, block_size=64, min_blocks=4
    )
    assert _rows(blocked) == _rows(exact)


def test_blocked_plan_has_no_nested_loop(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    blocked = embedding_cosine_pairs_blocked(e, "embedding", "vec_id", threshold=0.45)
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan  # the GEMM stage
    # while the oracle operator (deliberately) is a nested-loop product
    exact = embedding_cosine_pairs(e, "embedding", "vec_id", threshold=0.45)
    exact_plan = exact._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in exact_plan or "CartesianProduct" in exact_plan


def test_blocked_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = embedding_cosine_pairs_blocked(empty, "embedding", "vec_id", threshold=0.9)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_a", "vec_b", "cosine"]
