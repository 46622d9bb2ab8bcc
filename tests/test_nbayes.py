"""In-plan Naive Bayes classifier (operators/nbayes.py): learning mechanism
on a separable corpus, weight-sign sanity, unknown-token handling, and
determinism of the decimal-exact scoring."""

import pyspark.sql.functions as F
import pytest

from datapipelines_spark.operators.nbayes import nb_score, nb_token_weights


@pytest.fixture(scope="module")
def separable(spark):
    rows = []
    for i in range(40):
        rows.append((i, "alpha beta gamma alpha", 1))
        rows.append((100 + i, "delta epsilon zeta delta", 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_separable_corpus_classifies_perfectly(spark, separable):
    w = nb_token_weights(separable, "text", F.col("label") == 1, "doc_id")
    scored = nb_score(separable, w, "text", "doc_id")
    joined = scored.join(separable.select("doc_id", "label"), "doc_id")
    acc = joined.select(
        ((F.col("score") > 0) == (F.col("label") == 1)).cast("int").alias("ok")
    ).agg(F.avg("ok")).collect()[0][0]
    assert acc == 1.0


def test_weight_signs_follow_class_evidence(spark, separable):
    w = {r["token"]: float(r["weight"]) for r in
         nb_token_weights(separable, "text", F.col("label") == 1, "doc_id").collect()}
    assert w["alpha"] > 0 and w["beta"] > 0
    assert w["delta"] < 0 and w["zeta"] < 0


def test_unknown_tokens_score_zero(spark, separable):
    w = nb_token_weights(separable, "text", F.col("label") == 1, "doc_id")
    probe = spark.createDataFrame(
        [(999, "unseen words only here")], "doc_id long, text string"
    )
    row = nb_score(probe, w, "text", "doc_id").collect()[0]
    assert row["n_tokens"] == 4
    assert float(row["score"]) == 0.0


def test_scoring_deterministic_across_partitionings(spark, separable):
    w = nb_token_weights(separable, "text", F.col("label") == 1, "doc_id")
    a = {r["doc_id"]: r["score"] for r in
         nb_score(separable, w, "text", "doc_id").collect()}
    b = {r["doc_id"]: r["score"] for r in
         nb_score(separable.repartition(13), w, "text", "doc_id").collect()}
    assert a == b  # decimal-exact sums: order/partitioning-independent


def test_occurrences_counted_not_distinct(spark, separable):
    # "alpha" appears twice per positive doc: its weight must count twice
    w = nb_token_weights(separable, "text", F.col("label") == 1, "doc_id")
    wa = {r["token"]: r["weight"] for r in w.collect()}
    one = spark.createDataFrame([(1, "alpha alpha")], "doc_id long, text string")
    row = nb_score(one, w, "text", "doc_id").collect()[0]
    assert float(row["score"]) == pytest.approx(2 * float(wa["alpha"]))
