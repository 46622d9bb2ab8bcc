"""Sketch-assisted EXACT heavy hitters — find-then-verify at corpus scale.

The naive "which tokens exceed p% of the corpus" plan shuffles EVERY
distinct token to count it — at 100 TB that is a full-vocabulary shuffle to
answer a question whose result has at most 1/p rows. The scale pattern is
two passes:

  1. CANDIDATES: Spark's ``DataFrame.stat.freqItems`` (the Karp/
     Papadimitriou/Shenker generalization of Misra-Gries boyer-moore
     counting, executed JVM-side as one scan with per-partition merge)
     returns a SUPERSET of every item with frequency > support — at most
     ~1/support candidates, no shuffle of the long tail;
  2. VERIFY: exact counts for the candidate set only — the corpus is
     filtered by a broadcast candidate list before the aggregate, so the
     only shuffle carries partial counts for <= 1/support keys.

The superset guarantee in step 1 plus exact verification in step 2 makes
the RESULT exact (false candidates fall out; true heavy hitters cannot be
missed), which is why the catalog query can be oracle-checked against the
brute-force SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def heavy_hitters(
    df: DataFrame,
    col: str,
    support: float = 0.01,
) -> DataFrame:
    """(item, n, share): every value of ``col`` occurring in more than
    ``support`` fraction of rows — EXACT, via sketch candidates + verified
    counts. ``support`` must be at least 1e-4 (the candidate set and the
    verify shuffle are bounded by ~1/support)."""
    if not 0.0001 <= support < 1.0:
        raise ValueError("support must be in [1e-4, 1)")
    row = df.select(F.col(col).alias("item")).stat.freqItems(
        ["item"], support
    ).collect()[0]
    candidates = [c for c in row[0] if c is not None]
    if not candidates:
        # Derive the empty frame from the INPUT so `item` keeps the input
        # column's type — a hardcoded "item string" would diverge from the
        # non-empty branch for non-string columns and break schema-sensitive
        # consumers (unions, writes). ADVICE r6 #2.
        return df.select(F.col(col).alias("item")).limit(0).select(
            "item",
            F.lit(0).cast("bigint").alias("n"),
            F.lit(0.0).alias("share"),
        )
    total = df.count()
    counts = (
        df.select(F.col(col).alias("item"))
        .where(F.col("item").isin(candidates))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > support * total)
    )
    return counts.select(
        "item", "n", F.round(F.col("n") / F.lit(float(total)), 6).alias("share")
    )
