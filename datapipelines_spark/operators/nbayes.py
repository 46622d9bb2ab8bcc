"""In-plan multinomial Naive Bayes: a model-based quality/domain classifier
whose TRAINING and SCORING are both pure relational algebra — no Python in
the loop, no driver-resident model unless the caller wants the broadcast.

Real corpus pipelines gate documents with learned classifiers (quality,
language, domain). The heavyweight versions need external model runtimes;
the relational version here — token log-odds under Laplace smoothing — is
the classical baseline that runs INSIDE the engine at full corpus scale:

  train:  weights(token) = ln( P(token|pos) / P(token|neg) )
          from two grouped counts over the labeled corpus — shuffles are
          per-token aggregates, the corpus streams once;
  score:  score(doc) = Σ_occurrences weights(token) (+ class prior)
          — explode → broadcast-join the weight table → per-doc sum. The
          vocabulary is tiny next to the corpus, so the corpus never
          shuffles on the scoring side.

Numeric discipline for cross-engine reproducibility (the DuckDB oracle):
per-token log-odds are rounded to 6 decimals and cast to DECIMAL before the
per-doc SUM, so the aggregation is exact decimal arithmetic — associative,
order-independent, and immune to the 1-ulp differences between libm
implementations of ln().
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _tokens(df: DataFrame, text_col: str, id_col: str, label: Column) -> DataFrame:
    return df.select(
        F.col(id_col).alias("__id"),
        label.alias("__pos"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).where(F.col("token") != "")


def nb_token_weights(
    df: DataFrame,
    text_col: str,
    positive: Column,
    id_col: str,
    alpha: float = 1.0,
) -> DataFrame:
    """(token, weight) log-odds table from the labeled corpus.

    Laplace-smoothed with ``alpha``; the vocabulary size V in the smoothing
    denominator is computed in-plan (a count-distinct over tokens), so the
    whole training job is two aggregates and a cross-join of two scalar
    totals — no collect.
    """
    toks = _tokens(df, text_col, id_col, positive)
    counts = toks.groupBy("token").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("n_neg"),
    )
    totals = counts.agg(
        F.sum("n_pos").alias("tot_pos"),
        F.sum("n_neg").alias("tot_neg"),
        F.count(F.lit(1)).alias("vocab"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "token",
            F.round(
                F.log(
                    ((F.col("n_pos") + F.lit(alpha)) / (F.col("tot_pos") + alpha * F.col("vocab")))
                    / ((F.col("n_neg") + F.lit(alpha)) / (F.col("tot_neg") + alpha * F.col("vocab")))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("weight"),
        )
    )


def nb_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(id, n_tokens, score) for every document: exact-decimal sum of the
    token log-odds over token OCCURRENCES. Unknown tokens contribute 0
    (left join), keeping the scorer total on corpora wider than the
    training vocabulary."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).where(F.col("token") != "")
    return (
        toks.join(F.broadcast(weights), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("weight"), F.lit(0).cast("decimal(18,6)")))
            .cast("decimal(28,6)")
            .alias("score"),
        )
    )
