"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine. All pure DataFrame transforms (JVM expressions only — no
Python UDFs anywhere in this module), composable with any upstream pipeline.

Hashing is the portable md5-derived 32-bit scheme from functions/hashing.py,
so every signature is deterministic, retry-stable, and reproducible outside
Spark (the DuckDB oracles in queries/dedup.py recompute them exactly).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from datapipelines_spark.functions.hashing import portable_hash64

#: 2^31 - 1; modulus for the universal-hash family. Coefficients are kept
#: < 2^20 so a*h + b stays < 2^52 — exact in BIGINT arithmetic in Spark,
#: DuckDB, and IEEE doubles alike.
MERSENNE_PRIME = 2_147_483_647


@dataclass(frozen=True)
class MinHashConfig:
    num_hashes: int = 16
    bands: int = 4
    ngram: int = 3

    def coefficients(self) -> list[tuple[int, int]]:
        """Deterministic (a_i, b_i) pairs for h_i(x) = (a_i*x + b_i) mod p."""
        return [
            ((733 * (i + 1)) % 1_048_573 + 1, (97_531 * (i + 1)) % MERSENNE_PRIME)
            for i in range(self.num_hashes)
        ]


# ---------------------------------------------------------------------------
# exact


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group by content digest: (content_hash, n_copies, canonical_doc_id).

    The digest is computed map-side, so only 32-byte keys + ids shuffle.
    """
    return df.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min(id_col).alias("canonical_doc_id"),
    )


def drop_exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row (min id) per distinct content — the apply-side of
    exact_duplicates, usable mid-pipeline."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


# ---------------------------------------------------------------------------
# shingles


def word_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles: one row per (id, shingle).

    Built with higher-order array functions (codegen'd, no Python): split →
    sliding slice → distinct → explode.
    """
    words = F.split(F.col(text_col), " ")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return (
        df.where(F.size(words) >= n)
        .select(F.col(id_col), F.explode(F.array_distinct(shingles)).alias("s"))
    )


def _shingle_sizes(sh: DataFrame, id_col: str) -> DataFrame:
    return sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))


def _jaccard_from_common(
    pairs: DataFrame, sizes: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    sa = sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("n", "n_a")
    sb = sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("n", "n_b")
    j = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(j >= threshold)
        .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Near-dup pairs by exact word-n-gram Jaccard via inverted-index join.

    Shuffle pattern: one explode+distinct per doc, an equi-join on the
    shingle string, one count per pair — no cross join. For 100 TB add a
    document-frequency cap on shingles (drop shingles appearing in > k docs)
    before the self-join; not needed at fixture scale.
    """
    sh = word_shingles(df, text_col, id_col, n)
    a = sh.select(F.col(id_col).alias("doc_a"), "s")
    b = sh.select(F.col(id_col).alias("doc_b"), "s")
    pairs = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return _jaccard_from_common(pairs, _shingle_sizes(sh, id_col), id_col, threshold)


# ---------------------------------------------------------------------------
# MinHash + LSH


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, config: MinHashConfig = MinHashConfig()
) -> DataFrame:
    """One row per doc with columns h0..h{k-1}: min over shingles of
    (a_i * H(shingle) + b_i) mod p. Partial (map-side) min makes the shuffle
    carry k bigints per doc, independent of document size."""
    sh = word_shingles(df, text_col, id_col, config.ngram)
    h = portable_hash64(F.col("s"))
    mins = [
        F.min((F.lit(a) * h + F.lit(b)) % MERSENNE_PRIME).alias(f"h{i}")
        for i, (a, b) in enumerate(config.coefficients())
    ]
    return sh.groupBy(id_col).agg(*mins)


def lsh_band_keys(sig: DataFrame, id_col: str, config: MinHashConfig) -> DataFrame:
    """Explode signatures into (id, band_id, band_key) rows; band_key is the
    md5 of the band's hash values so the join key is fixed-width."""
    rows_per_band = config.num_hashes // config.bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "-",
                        *[
                            F.col(f"h{i}").cast("string")
                            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(config.bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(bands).alias("band")).select(
        id_col, F.col("band.band_id").alias("band_id"), F.col("band.band_key").alias("band_key")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    config: MinHashConfig = MinHashConfig(),
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs from LSH band buckets, verified by exact Jaccard.

    Only bucket-mates are ever compared: candidate volume tracks duplicate
    density, not n². The verification join touches shingles again but only
    for candidate ids (semi-joined), so it stays proportional to candidates.
    """
    sh = word_shingles(df, text_col, id_col, config.ngram)
    sig = minhash_signatures(df, text_col, id_col, config)
    bands = lsh_band_keys(sig, id_col, config)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band_id", "band_key"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("doc_a"), F.col(f"y.{id_col}").alias("doc_b"))
        .distinct()
    )
    sh_a = sh.select(F.col(id_col).alias("doc_a"), F.col("s").alias("s_a"))
    sh_b = sh.select(F.col(id_col).alias("__doc_b"), F.col("s").alias("s_b"))
    verified = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, (F.col("doc_b") == F.col("__doc_b")) & (F.col("s_a") == F.col("s_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return _jaccard_from_common(verified, _shingle_sizes(sh, id_col), id_col, threshold)


# ---------------------------------------------------------------------------
# SimHash


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """Term-frequency-weighted SimHash: (id, simhash bigint).

    Pipeline: token counts → portable token hash → per-bit ±weight sums →
    bit assembly. Two shuffles (token group, bit group), both on compact keys.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    th = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("w")).select(
        F.col(id_col), portable_hash64(F.col("tok")).alias("h"), "w"
    )
    bits_df = (
        th.select(F.col(id_col), "h", "w", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"))
        .groupBy(id_col, "j")
        .agg(
            F.sum(
                F.when(
                    F.expr("shiftright(h, CAST(j AS INT))").bitwiseAND(F.lit(1)) == 1,
                    F.col("w"),
                ).otherwise(-F.col("w"))
            ).alias("weight")
        )
    )
    return bits_df.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("weight") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))")
            ).otherwise(F.lit(0))
        ).alias("simhash")
    )


# ---------------------------------------------------------------------------
# embedding cosine


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def embedding_cosine_pairs(
    df: DataFrame, vec_col: str, id_col: str, threshold: float = 0.9
) -> DataFrame:
    """Brute-force near-dup pairs with cosine ≥ threshold.

    O(n²) by construction — the correctness baseline. At scale use
    similarity.lsh_signatures to bucket first; this operator then runs per
    bucket.
    """
    e = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    a = e.select(F.col(id_col).alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = e.select(F.col(id_col).alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine_raw", cos)
        .where(F.col("cosine_raw") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine_raw", 6).alias("cosine"))
    )
