"""Content-defined chunking (CDC) for sub-document deduplication.

Document-level dedup misses boilerplate SHARED ACROSS documents (licence
headers, navigation chrome, templated intros). The standard fix is to
chunk text at content-defined boundaries — a rolling hash over a small
window declares a boundary wherever ``hash % divisor == divisor - 1`` —
so identical passages chunk identically regardless of where they sit in a
document (inserting a preamble does not shift later boundaries, unlike
fixed-size windows), then dedup exact chunks corpus-wide.

Spark shape: chunking is one Arrow pandas stage (the rolling hash is
inherently sequential per document, vectorized across the batch rows);
everything after — chunk hashing, duplicate grouping, coverage stats — is
JVM-side aggregates over the exploded (doc, chunk) rows.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

#: Gear table for the rolling hash (gear-CDC): one 64-bit constant per byte
#: value, generated from a fixed seed so chunk boundaries are reproducible
#: across sessions, machines, and retries.
def _gear_table() -> list[int]:
    x = 0x9E3779B97F4A7C15
    out = []
    for _ in range(256):
        # splitmix64 step — deterministic, public-domain PRNG
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        out.append(z ^ (z >> 31))
    return out


_GEAR = _gear_table()


def _chunk_one(text: str, divisor: int, min_len: int, max_len: int) -> list[str]:
    data = text.encode("utf-8")
    gear = _GEAR
    mask = divisor - 1  # divisor is a power of two
    chunks = []
    start = 0
    h = 0
    n = len(data)
    i = 0
    while i < n:
        h = ((h << 1) + gear[data[i]]) & 0xFFFFFFFFFFFFFFFF
        i += 1
        # a cut is legal only on a UTF-8 codepoint boundary: a byte-offset
        # cut inside a multi-byte sequence corrupts BOTH neighboring chunks
        # (replacement chars), breaks chunk reassembly, and — worse — lets
        # two DIFFERENT byte chunks decode to the same replaced string and
        # chunk_hash-collide into a false duplicate. The hash still ingests
        # every byte; only the boundary decision waits for the character to
        # complete, so max_len can overshoot by at most 3 bytes on
        # multi-byte text (identical behavior on ASCII).
        if i < n and (data[i] & 0xC0) == 0x80:
            continue
        length = i - start
        if (length >= min_len and (h & mask) == mask) or length >= max_len:
            chunks.append(data[start:i].decode("utf-8"))
            start = i
            h = 0
    if start < n:
        chunks.append(data[start:].decode("utf-8"))
    return chunks


def content_defined_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    divisor: int = 64,
    min_len: int = 16,
    max_len: int = 256,
) -> DataFrame:
    """Exploded (id, chunk_idx, chunk, chunk_hash) rows; ``divisor`` sets the
    expected chunk length (power of two), ``min_len``/``max_len`` bound it
    (byte lengths; boundaries snap to UTF-8 codepoint edges, so ``max_len``
    can overshoot by up to 3 bytes on multi-byte text and chunks always
    reassemble losslessly to the document)."""
    if divisor & (divisor - 1):
        raise ValueError("divisor must be a power of two")

    schema = T.StructType(
        [
            T.StructField("__id", T.LongType()),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("chunk", T.StringType()),
        ]
    )

    def chunker(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, idxs, chunks = [], [], []
            for i, t in zip(pdf["__id"], pdf["__text"]):
                if t is None:
                    continue
                for ci, ch in enumerate(_chunk_one(t, divisor, min_len, max_len)):
                    ids.append(int(i))
                    idxs.append(ci)
                    chunks.append(ch)
            yield pd.DataFrame({"__id": ids, "chunk_idx": idxs, "chunk": chunks})

    proj = df.select(
        F.col(id_col).cast("long").alias("__id"), F.col(text_col).alias("__text")
    )
    return (
        proj.mapInPandas(chunker, schema)
        .withColumnRenamed("__id", id_col)
        .withColumn("chunk_hash", F.sha2(F.col("chunk"), 256))
    )


def chunk_dedup_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    divisor: int = 64,
    min_len: int = 16,
    max_len: int = 256,
) -> DataFrame:
    """Per-document sub-document duplication: (id, n_chunks, n_dup_chunks,
    dup_chunk_ratio) where a chunk is a duplicate if the SAME chunk bytes
    appear in any other document (or earlier in this one). The corpus-wide
    boilerplate detector: docs with high ratios are template-dominated.

    Plan: one Arrow chunking pass, one aggregate per chunk hash (canonical
    holder = min (id, idx)), one per-doc rollup — two shuffles total, both
    on partially-aggregated rows.
    """
    chunks = content_defined_chunks(df, text_col, id_col, divisor, min_len, max_len)
    canon = chunks.groupBy("chunk_hash").agg(
        F.min(F.struct(F.col(id_col), F.col("chunk_idx"))).alias("first"),
        F.count(F.lit(1)).alias("n_total"),
    )
    # chunk_hash keys both sides of this join: the canon aggregate's shuffle
    # partitioning is reused, and canon is NOT broadcast (it is as wide as
    # the distinct-chunk set — corpus-sized at scale)
    tagged = chunks.join(canon, "chunk_hash").withColumn(
        "is_dup",
        (F.col("n_total") > 1)
        & ~(
            (F.col(id_col) == F.col("first")[id_col])
            & (F.col("chunk_idx") == F.col("first.chunk_idx"))
        ),
    )
    return tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("is_dup").cast("int")).alias("n_dup_chunks"),
        F.round(
            F.sum(F.col("is_dup").cast("int")) / F.count(F.lit(1)), 6
        ).alias("dup_chunk_ratio"),
    )


def fixed_overlap_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(id, chunk_idx, n_chunk_tokens, chunk): fixed-size token windows with
    ``overlap`` shared tokens between neighbours — the retrieval-chunking
    shape (embedding windows for RAG indexes, long-document sharding for
    bounded-context models).

    Semantics: tokens are the raw space-split array; chunk i starts at
    token ``1 + i*(size-overlap)``; a start is kept while the PREVIOUS
    chunk did not already reach the document end (the final chunk may be
    short, and a short document yields exactly one chunk). Deterministic
    and purely positional, so the whole operator is JVM-side array math —
    ``sequence`` for the starts, a ``filter`` lambda for the stop rule, one
    ``explode``, and a ``slice``/``array_join`` per row; per-row cost is
    O(n_tokens), there is NO shuffle at all, and at 100 TB the operator is
    a single narrow map stage that pipelines into whatever aggregation
    follows (unlike the CDC chunker above it never leaves the JVM).
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap
    toks = F.split(F.col(text_col), " ")
    proj = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
    )
    # keep start s iff s == 1 (every doc has a first chunk) or the previous
    # chunk (ending at s - step + size - 1) stopped short of the last token
    starts = F.filter(
        F.sequence(F.lit(1), F.col("__n"), F.lit(step)),
        lambda s: (s == F.lit(1)) | ((s + F.lit(size - step)) <= F.col("__n")),
    )
    return (
        proj.select(F.col(id_col), "__toks", "__n", F.explode(starts).alias("__start"))
        .select(
            F.col(id_col),
            ((F.col("__start") - 1) / F.lit(step)).cast("int").alias("chunk_idx"),
            F.least(F.lit(size), F.col("__n") - F.col("__start") + 1)
            .cast("bigint")
            .alias("n_chunk_tokens"),
            F.array_join(
                F.slice(F.col("__toks"), F.col("__start"), F.lit(size)), " "
            ).alias("chunk"),
        )
    )
