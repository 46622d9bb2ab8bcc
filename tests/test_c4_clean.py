"""C4 line filter + normalized exact dedup (operators/text.py): the
Raffel et al. 2020 line rules on hand-built documents, and the
canonicalization contract on planted case/punct/spacing variants."""

import pyspark.sql.functions as F

from datapipelines_spark.operators.text import (
    c4_line_filter,
    normalized_exact_dedup,
)


def test_c4_rules_on_handbuilt_document(spark):
    text = "\n".join(
        [
            "this line is fine and ends properly.",  # kept
            "no terminal punctuation here",  # dropped: no [.!?]$
            "too short.",  # dropped: < 3 words
            "enable javascript to view this page.",  # dropped: banned word
            "var cfg = { a: 1 };",  # dropped: brace (and ; terminal)
            "lorem ipsum dolor sit amet.",  # dropped: banned phrase
            "another perfectly good sentence!",  # kept
            "is this a question?",  # kept
        ]
    )
    df = spark.createDataFrame([(1, text), (2, None)], "id long, text string")
    rows = c4_line_filter(df, "text", "id", min_kept_lines=3).collect()
    assert len(rows) == 1  # NULL text out of domain
    r = rows[0]
    assert (r["n_lines"], r["n_kept_lines"], r["passes"]) == (8, 3, True)
    assert r["clean_text"].split("\n") == [
        "this line is fine and ends properly.",
        "another perfectly good sentence!",
        "is this a question?",
    ]


def test_c4_document_gate_threshold(spark):
    df = spark.createDataFrame(
        [(1, "one good line right here.\nsecond decent line too.")],
        "id long, text string",
    )
    r = c4_line_filter(df, "text", "id", min_kept_lines=3).collect()[0]
    assert r["n_kept_lines"] == 2 and r["passes"] is False


def test_normalized_dedup_collapses_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello,   World!"),
            (2, "hello world"),  # same after normalization
            (3, "HELLO ... WORLD"),  # same
            (4, "hello worlds"),  # different
        ],
        "id long, text string",
    )
    got = {
        r["id"]: r["is_norm_canonical"]
        for r in normalized_exact_dedup(df, "text", "id").collect()
    }
    assert got == {1: True, 2: False, 3: False, 4: True}
    hashes = {
        r["id"]: r["norm_md5"]
        for r in normalized_exact_dedup(df, "text", "id").collect()
    }
    assert hashes[1] == hashes[2] == hashes[3] != hashes[4]
