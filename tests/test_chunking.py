"""Content-defined chunking (operators/chunking.py): the CDC boundary
property (insertions don't shift downstream boundaries), determinism, and
the sub-document dedup stats."""

import pyspark.sql.functions as F
import pytest

from datapipelines_spark.operators.chunking import (
    _chunk_one,
    chunk_dedup_stats,
    content_defined_chunks,
)

BODY = " ".join(f"word{i % 97} tok{i * 7 % 31}" for i in range(400))


def test_chunks_reassemble_to_original():
    chunks = _chunk_one(BODY, 64, 16, 256)
    assert "".join(chunks) == BODY
    assert all(16 <= len(c.encode()) <= 256 for c in chunks[:-1])


def test_boundaries_survive_a_prefix_insertion():
    """THE content-defined property: prepending text changes only the early
    chunks — after the hash re-synchronizes, downstream boundaries (and so
    the chunk set) realign, which fixed-size windows never do."""
    a = set(_chunk_one(BODY, 64, 16, 256))
    b = set(_chunk_one("PREAMBLE INSERTED HERE. " + BODY, 64, 16, 256))
    common = a & b
    assert len(common) >= 0.8 * len(a), (len(common), len(a))


def test_chunking_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(
        [(i, BODY[i:] + BODY[:i]) for i in range(20)], "doc_id long, text string"
    )
    a = sorted(
        tuple(r)
        for r in content_defined_chunks(df, "text", "doc_id").select(
            "doc_id", "chunk_idx", "chunk_hash"
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in content_defined_chunks(
            df.repartition(7), "text", "doc_id"
        ).select("doc_id", "chunk_idx", "chunk_hash").collect()
    )
    assert a == b


def test_dup_stats_flag_shared_boilerplate(spark):
    boiler = " ".join(f"LICENSE-{i} boilerplate clause {i}" for i in range(40))
    rows = [(i, boiler + f" unique tail {i} " + BODY[i * 10 :]) for i in range(6)]
    rows.append((99, "totally unrelated " + BODY[::-1]))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {r["doc_id"]: r for r in
             chunk_dedup_stats(df, "text", "doc_id").collect()}
    # the boilerplate docs share chunks; the canonical holder (doc 0) owns
    # the first copies, later docs see them as duplicates
    assert stats[1]["dup_chunk_ratio"] > 0.2
    assert stats[99]["n_dup_chunks"] == 0
    assert stats[0]["n_dup_chunks"] < stats[1]["n_dup_chunks"]


def test_divisor_must_be_power_of_two(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="power of two"):
        content_defined_chunks(df, "text", "doc_id", divisor=100)
