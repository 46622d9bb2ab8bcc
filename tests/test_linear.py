"""In-plan logistic regression (operators/linear.py): the trained model
must separate a separable corpus, training must be deterministic under
different partitionings (the decimal-exact epoch discipline), and the
feature hasher must honor its domain contract."""

import pyspark.sql.functions as F

from datapipelines_spark.operators.linear import (
    hashed_ngram_features,
    logreg_score,
    logreg_train,
)


def _corpus(spark):
    rows = []
    for i in range(24):
        if i % 2 == 0:
            rows.append((i, "good great fine clean prose readable text", 1))
        else:
            rows.append((i, "bad awful poor junk noise garbled spam", 0))
    return spark.createDataFrame(rows, "id long, text string, y int")


def test_separable_corpus_is_separated(spark):
    d = _corpus(spark)
    feats = hashed_ngram_features(d, "text", "id", buckets=32)
    w = logreg_train(
        feats, d.select("id", "y"), id_col="id", buckets=32, epochs=4, lr=1.0
    )
    scored = logreg_score(feats, w, "id").join(d.select("id", "y"), "id")
    rows = scored.collect()
    assert all((r["pred"] is True) == (r["y"] == 1) for r in rows), rows


def test_training_is_partitioning_invariant(spark):
    d = _corpus(spark)
    feats = hashed_ngram_features(d, "text", "id", buckets=32)
    labels = d.select("id", "y")
    w1 = logreg_train(feats.repartition(1), labels, "id", 32, 2, 0.5)
    w8 = logreg_train(feats.repartition(8), labels, "id", 32, 2, 0.5)
    a = {r["bucket"]: str(r["weight"]) for r in w1.collect()}
    b = {r["bucket"]: str(r["weight"]) for r in w8.collect()}
    assert a == b


def test_feature_hasher_domain(spark):
    d = spark.createDataFrame(
        [(1, "a  b"), (2, None), (3, ""), (4, "solo")],
        "id long, text string",
    )
    feats = hashed_ngram_features(d, "text", "id", buckets=8)
    rows = feats.collect()
    # NULL text: no rows at all (declared domain)
    assert all(r["id"] != 2 for r in rows)
    # empty text: bias row only; 'solo': unigram + bias, no bigram
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    assert len(by_id[3]) == 1 and by_id[3][0]["bucket"] == 8
    assert len(by_id[4]) == 2
    # double space mints no empty-token grams: 'a  b' has 2 unigrams,
    # 1 bigram ('a b'), 1 bias
    assert sum(r["cnt"] for r in by_id[1]) == 4
