"""BPE tokenizer (operators/bpe.py): hand-derived merge sequences, tie
rules, encode/train consistency, and the word-boundary invariant."""

import pyspark.sql.functions as F

from datapipelines_spark.operators.bpe import (
    END_OF_WORD,
    _encode_word,
    bpe_encode,
    bpe_train,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_hand_derived_merges(spark):
    # words: ab x3, b x1 -> pair counts (a,b)=3, (b,</w>)=4
    df = _docs(spark, ["ab ab", "ab b"])
    merges = bpe_train(df, "text", num_merges=5)
    # merge 1: (b,</w>) count 4; merge 2: (a,b</w>) count 3; then no pairs
    assert merges == [("b", END_OF_WORD), ("a", "b" + END_OF_WORD)]


def test_train_tie_breaks_lexicographically(spark):
    # a and b both occur twice: (a,</w>) and (b,</w>) tie at 2 -> lexicographic
    df = _docs(spark, ["a b", "b a"])
    merges = bpe_train(df, "text", num_merges=1)
    assert merges == [("a", END_OF_WORD)]


def test_encode_applies_merges_by_rank(spark):
    df = _docs(spark, ["ab ab", "ab b"])
    merges = bpe_train(df, "text", num_merges=5)
    got = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(df, "text", "doc_id", merges).collect()
    }
    assert got[0] == ["ab" + END_OF_WORD] * 2
    assert got[1] == ["ab" + END_OF_WORD, "b" + END_OF_WORD]
    # unseen word: no applicable merge beyond the learned ones
    other = _docs(spark, ["ba"])
    enc = bpe_encode(other, "text", "doc_id", merges).collect()[0]["tokens"]
    assert enc == ["b", "a", END_OF_WORD]


def test_encode_word_lowest_rank_first():
    # lowest-rank adjacent pair merges first: (b,c) at rank 0 beats (a,b)
    # at rank 1, after which (a,bc) applies
    assert _encode_word("abc", {("b", "c"): 0, ("a", "b"): 1, ("a", "bc"): 2}) == [
        "abc",
        END_OF_WORD,
    ]
    # with (a,b) ranked lowest instead, the merge path differs
    assert _encode_word("abc", {("a", "b"): 0, ("b", "c"): 1}) == [
        "ab",
        "c",
        END_OF_WORD,
    ]
    # without a follow-up merge, the leading symbol stays separate
    assert _encode_word("abc", {("b", "c"): 0}) == ["a", "bc", END_OF_WORD]


def test_reassembly_and_monotonicity_on_fixture(spark, sf_dir):
    import os

    d = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .where(F.col("text").isNotNull())
        .limit(200)
    )
    merges = bpe_train(d, "text", num_merges=30, max_words=5000)
    assert len(merges) == 30
    full = bpe_encode(d, "text", "doc_id", merges)
    half = bpe_encode(d, "text", "doc_id", merges[:10]).select(
        "doc_id", F.col("tokens").alias("tokens_half")
    )
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    joined = (
        d.select("doc_id", words.alias("w"))
        .join(full, "doc_id")
        .join(half, "doc_id")
        .select(
            (
                F.rtrim(
                    F.replace(
                        F.array_join("tokens", ""), F.lit(END_OF_WORD), F.lit(" ")
                    )
                )
                == F.array_join("w", " ")
            ).alias("reassembles"),
            (F.size("tokens") <= F.size("tokens_half")).alias("monotonic"),
        )
    )
    rows = joined.collect()
    assert rows and all(r["reassembles"] for r in rows)
    assert all(r["monotonic"] for r in rows)


# --- encode-equivalence fuzz -------------------------------------------------
# The priority encode loop (_encode_word: merge the lowest-ranked applicable
# pair, repeat) is the optimized form of the original Sennrich formulation
# (replay the learned rules IN ORDER, merging every occurrence left to
# right). For merge lists actually produced by training the two are
# equivalent — a merge's constituent symbols can only be built by strictly
# earlier merges — and that equivalence is exactly what makes the fast loop
# safe to ship. Fuzz it: random corpora, learned merges, random words
# (including words never seen in training).

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abc", min_size=1, max_size=7)


def _encode_in_order(word, merges):
    symbols = list(word) + [END_OF_WORD]
    for a, b in merges:
        out, i = [], 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


@settings(max_examples=10, deadline=None)
@given(
    corpus=st.lists(
        st.lists(_word, min_size=1, max_size=5).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    probes=st.lists(_word, min_size=1, max_size=6),
    num_merges=st.integers(1, 12),
)
def test_priority_encode_matches_in_order_replay(spark, corpus, probes, num_merges):
    merges = bpe_train(_docs(spark, corpus), "text", num_merges=num_merges)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in probes:
        fast = _encode_word(w, ranks)
        assert fast == _encode_in_order(w, merges)
        # reassembly: tokens concatenate back to the word + boundary marker
        assert "".join(fast) == w + END_OF_WORD
