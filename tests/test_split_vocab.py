"""leakage_safe_split (operators/mixing.py) and build_vocab
(operators/text.py)."""

import pyspark.sql.functions as F
import pytest

from datapipelines_spark.operators.mixing import leakage_safe_split
from datapipelines_spark.operators.text import build_vocab


def test_split_keeps_clusters_together(spark):
    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    # chain clusters {0..4}, {10,11}, everything else singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    out = leakage_safe_split(docs, pairs, "doc_id", 0.3).collect()
    by_doc = {r["doc_id"]: (r["group_id"], r["in_split"]) for r in out}
    assert len(by_doc) == 200
    # cluster members share group AND side
    assert len({by_doc[i] for i in range(5)}) == 1
    assert by_doc[10] == by_doc[11]
    assert by_doc[0][0] == 0 and by_doc[10][0] == 10  # min-id group labels
    # roughly fraction-sized holdout over the singletons
    frac = sum(1 for g, s in by_doc.values() if s) / 200
    assert 0.15 < frac < 0.45


def test_split_deterministic_across_partitionings(spark):
    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    a = sorted(map(tuple, leakage_safe_split(docs, pairs, "doc_id", 0.5).collect()))
    b = sorted(
        map(
            tuple,
            leakage_safe_split(
                docs.repartition(13), pairs, "doc_id", 0.5
            ).collect(),
        )
    )
    assert a == b


def test_build_vocab_ids_and_truncation(spark):
    rows = [(1, "a a a b b c d d d d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["token"], r["n"], r["token_id"])
        for r in build_vocab(df, "text", "doc_id", min_count=2, max_size=2)
        .orderBy("token_id")
        .collect()
    ]
    # d(4) then a(3); b(2) truncated by max_size; c(1) under min_count
    assert got == [("d", 4, 0), ("a", 3, 1)]


def test_build_vocab_count_ties_break_lexicographically(spark):
    df = spark.createDataFrame([(1, "z z y y x")], "doc_id long, text string")
    got = [
        r["token"]
        for r in build_vocab(df, "text", "doc_id", max_size=3)
        .orderBy("token_id")
        .collect()
    ]
    assert got == ["y", "z", "x"]


def test_build_vocab_topn_is_take_ordered(spark):
    df = spark.createDataFrame([(1, "a b c a")], "doc_id long, text string")
    plan = (
        build_vocab(df, "text", "doc_id", max_size=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_build_vocab_rejects_bad_max_size(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        build_vocab(df, "text", "doc_id", max_size=0)


def test_temperature_mix_upweights_small_sources(spark):
    from datapipelines_spark.operators.mixing import temperature_mix

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r["source"]: r["count"]
        for r in temperature_mix(df, "source", "doc_id", 0.5, 200)
        .groupBy("source").count().collect()
    }
    # alpha=0.5 quotas: sqrt(.9)/(sqrt(.9)+sqrt(.1)) ~ 0.75 of 200 for big,
    # ~0.25 for small — small gets ~2.5x its proportional share
    assert 120 < got["big"] < 180
    assert 35 < got["small"] < 70


def test_temperature_mix_small_source_capped_at_whole(spark):
    from datapipelines_spark.operators.mixing import temperature_mix

    rows = [(i, "big" if i < 995 else "tiny") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, "source", "doc_id", 0.25, 800)
    tiny = out.where("source = 'tiny'").count()
    assert tiny == 5  # quota exceeds the source: take it whole, never more


def test_temperature_mix_deterministic(spark):
    from datapipelines_spark.operators.mixing import temperature_mix

    rows = [(i, f"s{i % 7}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(r["doc_id"] for r in temperature_mix(df, "source", "doc_id", 0.5, 100).collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_mix(df.repartition(11), "source", "doc_id", 0.5, 100).collect()
    )
    assert a == b
