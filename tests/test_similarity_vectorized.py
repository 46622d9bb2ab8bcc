"""The BLAS-vectorized top-k scorer must agree with the expression-based
exact operator (same ids; cosines equal to 1e-9)."""

import pyspark.sql.functions as F

from datapipelines_spark.operators.similarity import cosine_topk, cosine_topk_vectorized
from datapipelines_spark.sources.parquet import load_table


def test_vectorized_topk_matches_exact(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") % 100 == 0
    exact = cosine_topk(e, "embedding", "vec_id", pred, k=5)
    fast = cosine_topk_vectorized(e, "embedding", "vec_id", pred, k=5)
    ex = [(r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in
          exact.orderBy("query_id", "rank").collect()]
    fa = [(r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in
          fast.orderBy("query_id", "rank").collect()]
    assert ex == fa


def test_vectorized_topk_excludes_self(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    out = cosine_topk_vectorized(e, "embedding", "vec_id", F.col("vec_id") < 3, k=3)
    assert out.where(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_vectorized_topk_empty_query_set(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    out = cosine_topk_vectorized(e, "embedding", "vec_id", F.col("vec_id") < 0, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]
