"""In-plan linear text classifier — the fastText recipe (Joulin et al. 2017,
"Bag of Tricks for Efficient Text Classification": hashed bag-of-ngrams
features + a linear model) reduced to relational algebra, so a web-corpus
quality gate TRAINS and SCORES inside the engine with the corpus never
leaving the executors.

  features: token unigrams + bigrams, feature-hashed into ``buckets``
            integer slots (Weinberger et al. 2009 hashing trick) with the
            portable md5 hash — per-doc (bucket, count) rows plus one
            constant bias feature;
  train:    full-batch logistic regression by gradient descent. Each epoch
            is pure relational algebra: scores from one broadcast-join of
            the (buckets+1)-row weight table against the feature rows, the
            gradient from one per-bucket partial aggregate (map-side
            combine IS the per-partition gradient), the update from a
            broadcast scalar count. The corpus streams once per epoch and
            is never collected;
  score:    one more broadcast-join + per-doc sum; prediction = score > 0.

Numeric discipline for cross-engine replay (the nbayes.py precedent): the
weight table is DECIMAL(18,6) at every epoch boundary — per-doc residuals
round to 6 decimals before the gradient sum (exact decimal x integer
arithmetic, associative and order-independent), and the weight update does
its division in IEEE double (correctly rounded, so bit-identical across
engines) before rounding back to decimal. The only non-correctly-rounded
primitive in the loop is exp() inside the sigmoid, the same exposure the
Naive Bayes trainer accepts for ln().
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datapipelines_spark.functions.hashing import portable_hash64

BIAS = "__bias__"  # the constant feature rides as bucket == n_buckets


def hashed_ngram_features(
    df: DataFrame, text_col: str, id_col: str, buckets: int = 64
) -> DataFrame:
    """Per-document hashed bag-of-ngrams: ``(id, bucket, cnt)`` over token
    unigrams + bigrams (empty tokens dropped first, so runs of spaces
    cannot mint grams), plus one bias row ``bucket == buckets`` per
    document. NULL texts have no feature rows at all — callers declare the
    domain upstream."""
    df = df.where(F.col(text_col).isNotNull())
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    base = df.select(F.col(id_col), toks.alias("__toks"))
    uni = base.select(id_col, F.explode("__toks").alias("gram"))
    bi = base.select(
        id_col,
        F.explode(
            F.when(
                F.size("__toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("__toks") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("__toks", i),
                        F.element_at("__toks", i + 1),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    hashed = uni.unionByName(bi).select(
        id_col, (portable_hash64("gram") % buckets).alias("bucket")
    )
    counted = hashed.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    bias = base.select(
        id_col,
        F.lit(buckets).cast("bigint").alias("bucket"),
        F.lit(1).cast("bigint").alias("cnt"),
    )
    return counted.unionByName(bias)


def logreg_train(
    feats: DataFrame,
    labels: DataFrame,
    id_col: str,
    buckets: int = 64,
    epochs: int = 2,
    lr: float = 0.5,
) -> DataFrame:
    """Full-batch logistic regression over hashed features: returns the
    ``(bucket, weight)`` table after ``epochs`` gradient steps from zero
    init. ``labels`` is ``(id, y)`` with y in {0,1}.

    Epoch algebra (all in-plan; weights localCheckpoint'ed per epoch so the
    two consumers of each epoch's table — next scores and next update —
    share one materialization):

      z_d   = sum_j w_j x_dj                 (decimal x int, exact)
      r_d   = round(y_d - sigmoid(z_d), 6)   (the one exp() exposure)
      g_j   = sum_d r_d x_dj                 (exact decimal aggregate;
                                              map-side combine = the
                                              per-partition gradient)
      w_j  += round(lr * g_j / n, 6)         (IEEE-double division)
    """
    spark = feats.sparkSession
    zero = F.lit(0).cast("decimal(18,6)")
    w = spark.range(buckets + 1).select(
        F.col("id").cast("bigint").alias("bucket"), zero.alias("weight")
    )
    n_docs = labels.agg(F.count(F.lit(1)).alias("__n"))
    lab = labels.select(F.col(id_col), F.col("y").cast("int").alias("__y"))
    for _ in range(epochs):
        w = w.localCheckpoint(eager=True)
        z = (
            feats.join(F.broadcast(w), "bucket")
            .groupBy(id_col)
            .agg(F.sum(F.col("weight") * F.col("cnt")).alias("__z"))
        )
        resid = lab.join(z, id_col).select(
            F.col(id_col),
            F.round(
                F.col("__y")
                - F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__z").cast("double"))),
                6,
            )
            .cast("decimal(18,6)")
            .alias("__r"),
        )
        grad = (
            feats.join(resid, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("__r") * F.col("cnt")).alias("__g"))
        )
        w = (
            w.join(grad, "bucket", "left")
            .crossJoin(F.broadcast(n_docs))
            .select(
                "bucket",
                F.round(
                    F.col("weight").cast("double")
                    + F.lit(float(lr))
                    * F.coalesce(F.col("__g"), F.lit(0)).cast("double")
                    / F.col("__n"),
                    6,
                )
                .cast("decimal(18,6)")
                .alias("weight"),
            )
        )
    return w


def logreg_score(feats: DataFrame, weights: DataFrame, id_col: str) -> DataFrame:
    """(id, n_feats, score, pred) per document with feature rows: exact
    decimal sum of weight x count; prediction is the sign. One broadcast
    join — the corpus never shuffles."""
    return (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("bigint").alias("n_feats"),
            F.sum(F.col("weight") * F.col("cnt"))
            .cast("decimal(28,6)")
            .alias("score"),
        )
        .withColumn("pred", F.col("score") > 0)
    )
