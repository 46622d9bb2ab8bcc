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


# --- fixed-size overlapping chunking ----------------------------------------


def test_fixed_overlap_boundaries(spark):
    from datapipelines_spark.operators.chunking import fixed_overlap_chunks

    df = spark.createDataFrame(
        [
            (1, " ".join(str(i) for i in range(10))),  # 10 tokens
            (2, "only three tokens"),                  # shorter than size
            (3, " ".join(str(i) for i in range(13))),  # one token past a chunk end
        ],
        "doc_id long, text string",
    )
    got = {}
    for r in fixed_overlap_chunks(df, "text", "doc_id", size=8, overlap=4).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_chunk_tokens"], r["chunk"])
        )
    # n=10, size=8, step=4: starts 1,5 (9 dropped: chunk 5..10 reached the end)
    assert [(i, n) for i, n, _ in sorted(got[1])] == [(0, 8), (1, 6)]
    assert got[1][0][2].split(" ") == [str(i) for i in range(8)]
    assert got[1][1][2].split(" ") == [str(i) for i in range(4, 10)]
    # short doc: exactly one (short) chunk
    assert [(i, n, c) for i, n, c in got[2]] == [(0, 3, "only three tokens")]
    # n=13: starts 1,5,9,13 — 9 kept (chunk 5..12 stopped short of token
    # 13), 13 dropped (chunk 9..13 reached the end)
    assert [(i, n) for i, n, _ in sorted(got[3])] == [(0, 8), (1, 8), (2, 5)]


def test_fixed_overlap_rejects_bad_params(spark):
    import pytest

    from datapipelines_spark.operators.chunking import fixed_overlap_chunks

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        fixed_overlap_chunks(df, "text", "doc_id", size=8, overlap=8)
    with pytest.raises(ValueError):
        fixed_overlap_chunks(df, "text", "doc_id", size=8, overlap=-1)


def test_fixed_overlap_matches_python_reference_fuzz(spark):
    """Property fuzz of the boundary arithmetic: random (n, size, overlap)
    grids vs a direct Python reference of the start/stop rule."""
    import itertools

    from datapipelines_spark.operators.chunking import fixed_overlap_chunks

    cases = [
        (n, size, ov)
        for n, size, ov in itertools.product(
            [1, 2, 5, 8, 12, 13, 17, 40], [4, 8, 16], [0, 1, 3]
        )
        if ov < size
    ]
    rows = []
    for i, (n, _, _) in enumerate(cases):
        rows.append((i, " ".join(f"t{j}" for j in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for size in [4, 8, 16]:
        for ov in [0, 1, 3]:
            got = {}
            out = fixed_overlap_chunks(df, "text", "doc_id", size=size, overlap=ov)
            for r in out.collect():
                got.setdefault(r["doc_id"], []).append(
                    (r["chunk_idx"], r["chunk"].split(" "))
                )
            step = size - ov
            for i, (n, _, _) in enumerate(cases):
                toks = [f"t{j}" for j in range(n)]
                expect, idx = [], 0
                for s in range(0, n, step):
                    # skip when the previous chunk already reached the end
                    # (s - step + size >= n in 0-based terms)
                    if s != 0 and s + size - step >= n:
                        continue
                    expect.append((idx, toks[s : s + size]))
                    idx += 1
                assert sorted(got.get(i, [])) == expect, (i, n, size, ov)


def test_chunks_roundtrip_multibyte_text():
    """Boundaries must land on UTF-8 codepoint edges: byte-offset cuts
    inside a multi-byte sequence used to corrupt both neighboring chunks
    with replacement chars (and let two different byte chunks hash-collide
    after replacement). Chunks of any text must reassemble losslessly."""
    import random

    from datapipelines_spark.operators.chunking import _chunk_one

    rng = random.Random(7)
    for _ in range(200):
        t = "".join(rng.choice("漢字文本テキストabc déjà ") for _ in range(rng.randint(20, 400)))
        chunks = _chunk_one(t, 16, 4, 64)
        assert "".join(chunks) == t
        assert all("�" not in c for c in chunks)
        # max_len may overshoot only to complete one codepoint (<= 3 bytes)
        assert all(len(c.encode("utf-8")) <= 64 + 3 for c in chunks)


def test_multibyte_chunks_hash_distinct(spark):
    """Two documents whose byte chunks differ must never share a
    chunk_hash via lossy decoding (the pre-fix failure: both cut chunks
    decoded to '...�' and collided)."""
    import pyspark.sql.functions as F

    from datapipelines_spark.operators.chunking import content_defined_chunks

    texts = ["漢" * 40 + "a", "字" * 40 + "a"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = content_defined_chunks(df, "text", "doc_id", divisor=16, min_len=4, max_len=32)
    rows = out.select("doc_id", "chunk", "chunk_hash").collect()
    by_hash = {}
    for r in rows:
        by_hash.setdefault(r["chunk_hash"], set()).add(r["chunk"])
    # one hash, one chunk string — no post-decode collisions anywhere
    assert all(len(v) == 1 for v in by_hash.values())
    # and per-doc reassembly holds through the Spark path too
    per_doc = out.groupBy("doc_id").agg(
        F.concat_ws("", F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))).getField("chunk")).alias("re")
    ).collect()
    re = {r["doc_id"]: r["re"] for r in per_doc}
    assert re == {0: texts[0], 1: texts[1]}
