"""Winnowing document fingerprints — local, position-robust dedup signals.

The winnowing algorithm (Schleimer/Wilkerson/Aiken, "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS detector)
selects, from every sliding window of ``window`` consecutive k-gram
positions, the window's minimum shingle. The selected set is a tiny
per-document fingerprint with a GUARANTEE: any shared run of at least
``window + k - 1`` consecutive tokens between two documents yields at least
one shared fingerprint — unlike uniform shingle sampling, which can miss
arbitrarily long matches.

This implementation selects by LEXICOGRAPHIC minimum of the shingle string
("robust winnowing" works with any total order; lexicographic keeps the
whole computation relational and lets the DuckDB oracle replicate it
exactly — a hashed order would need the same hash on both engines). A
skewed-vocabulary corpus selects slightly less uniformly than a hashed
order would; the match guarantee is unaffected.

Spark shape: shingles are window-free array ops per document; the sliding
minimum is ONE window function partitioned by document and ordered by
position (rows frame, no cross-document shuffle beyond the doc-id hash
partition); the cross-document overlap join is the same inverted-index
self-join as dedup_ngram_jaccard — fingerprints being ~1/window of the
shingles, the join is proportionally cheaper.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _shingles(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(id, pos, s): word k-gram starting at each position (1-based)."""
    arr = F.split(F.col(text_col), " ")
    n = F.size(arr)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0))),
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(" ", F.slice(arr, i, k)).alias("s"),
        ),
    )
    return (
        df.where(n >= k)
        .select(F.col(id_col), F.explode(grams).alias("g"))
        .select(id_col, F.col("g.pos").alias("pos"), F.col("g.s").alias("s"))
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 7,
    window: int = 4,
) -> DataFrame:
    """(id, fp): the DISTINCT winnowing fingerprints of each document.

    Documents with fewer than ``window + k - 1`` tokens have no complete
    window and drop out (consistent with the guarantee's minimum match
    length)."""
    sh = _shingles(df, text_col, id_col, k)
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(0, window - 1)
    )
    n_pos = Window.partitionBy(id_col)
    return (
        sh.select(
            F.col(id_col),
            F.col("pos"),
            F.min("s").over(w).alias("fp"),
            F.max("pos").over(n_pos).alias("max_pos"),
        )
        # only COMPLETE windows select fingerprints: the last window starts
        # at max_pos - (window - 1)
        .where(F.col("pos") <= F.col("max_pos") - (window - 1))
        .select(id_col, "fp")
        .distinct()
    )


def fingerprint_overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 7,
    window: int = 4,
    min_shared: int = 2,
    max_fp_docs: int = 1000,
) -> DataFrame:
    """(doc_a, doc_b, n_shared): document pairs sharing >= ``min_shared``
    fingerprints — the MOSS-style local-plagiarism / shared-boilerplate
    detector, each shared fingerprint witnessing a run of >= window+k-1
    common tokens.

    Scale: inverted-index self-join on the fingerprint; fingerprints held
    by more than ``max_fp_docs`` documents are dropped first (corpus-wide
    boilerplate — a quadratic hot key that belongs to the chunk-dedup
    pipeline, not the pair detector; same cap discipline as
    operators/dedup.py)."""
    fps = winnow_fingerprints(df, text_col, id_col, k, window)
    small = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs")).where(
        F.col("n_docs") <= max_fp_docs
    )
    fps = fps.join(small.select("fp"), "fp")
    a = fps.select(F.col("fp"), F.col(id_col).alias("doc_a"))
    b = fps.select(F.col("fp"), F.col(id_col).alias("doc_b"))
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
