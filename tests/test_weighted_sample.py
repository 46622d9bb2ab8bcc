"""Efraimidis-Spirakis weighted sampling (operators/mixing.py:
weighted_sample_topk): proportionality, determinism, and plan shape."""

import pyspark.sql.functions as F

from datapipelines_spark.operators.mixing import weighted_sample_topk


def _df(spark):
    rows = [(i, 10.0 if i % 10 == 0 else 1.0) for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id long, w double")


def test_heavy_rows_oversampled(spark):
    df = _df(spark)  # 100 rows at weight 10, 900 at weight 1
    hits_heavy = 0
    for seed in range(8):
        got = weighted_sample_topk(df, "w", "doc_id", k=100, seed=seed).collect()
        hits_heavy += sum(1 for r in got if r["w"] == 10.0)
    # expected heavy share ~52% of draws vs 10% of rows; assert well above
    # the unweighted rate with slack for sampling noise
    assert hits_heavy / (8 * 100) > 0.30


def test_deterministic_across_partitionings_and_reruns(spark):
    df = _df(spark)
    a = [r["doc_id"] for r in weighted_sample_topk(df, "w", "doc_id", 25).collect()]
    b = [
        r["doc_id"]
        for r in weighted_sample_topk(df.repartition(13), "w", "doc_id", 25).collect()
    ]
    assert a == b


def test_nonpositive_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0)], "doc_id long, w double"
    )
    got = {r["doc_id"] for r in weighted_sample_topk(df, "w", "doc_id", 10).collect()}
    assert got == {3}


def test_topk_is_take_ordered(spark):
    df = _df(spark)
    plan = (
        weighted_sample_topk(df, "w", "doc_id", 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
