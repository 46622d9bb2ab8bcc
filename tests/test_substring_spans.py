"""Variable-length exact-substring duplicate spans
(operators/dedup.py:duplicate_substring_spans): maximal-span merging,
exact span text, and equivalence with a brute-force reference that
enumerates EVERY duplicated substring of length >= L (the Lee et al. 2022
removal semantics the operator claims to compute)."""

import random

import pyspark.sql.functions as F

from datapipelines_spark.operators.dedup import duplicate_substring_spans


def _spans(spark, docs, min_len=3, min_count=2):
    df = spark.createDataFrame(docs, "id long, text string")
    out = duplicate_substring_spans(
        df, text_col="text", id_col="id", min_len=min_len, min_count=min_count
    )
    return sorted(
        (r["id"], r["span_start"], r["span_len"], r["span_text"])
        for r in out.collect()
    )


def _brute_removal_cover(docs, min_len, min_count):
    """Reference: token positions covered by ANY substring of >= min_len
    tokens occurring >= min_count times corpus-wide (counting every
    occurrence), then merged into maximal intervals per doc."""
    toks = {i: t.split(" ") for i, t in docs if t is not None}
    from collections import Counter

    # every substring of length >= min_len is a union of min_len-windows,
    # so coverage reduces to duplicated fixed windows — but the brute
    # force here counts ALL lengths explicitly, which is the semantics
    # the docstring's iff-argument claims equal; this test is that proof.
    counts = Counter()
    for i, w in toks.items():
        for ln in range(min_len, len(w) + 1):
            for s in range(0, len(w) - ln + 1):
                counts[" ".join(w[s : s + ln])] += 1
    covered = {i: set() for i in toks}
    for i, w in toks.items():
        for ln in range(min_len, len(w) + 1):
            for s in range(0, len(w) - ln + 1):
                if counts[" ".join(w[s : s + ln])] >= min_count:
                    covered[i].update(range(s, s + ln))
    spans = []
    for i, cov in covered.items():
        run = sorted(cov)
        j = 0
        while j < len(run):
            k = j
            while k + 1 < len(run) and run[k + 1] == run[k] + 1:
                k += 1
            start, end = run[j], run[k]
            spans.append(
                (i, start, end - start + 1, " ".join(toks[i][start : end + 1]))
            )
            j = k + 1
    return sorted(spans)


def test_planted_duplicate_found_with_exact_text(spark):
    docs = [
        (1, "alpha beta gamma delta epsilon zeta unique one"),
        (2, "prefix words alpha beta gamma delta epsilon zeta tail"),
        (3, "nothing shared here at all whatsoever today"),
    ]
    got = _spans(spark, docs, min_len=3)
    assert (1, 0, 6, "alpha beta gamma delta epsilon zeta") in got
    assert (2, 2, 6, "alpha beta gamma delta epsilon zeta") in got
    assert all(i != 3 for i, *_ in got)


def test_overlapping_windows_merge_into_one_maximal_span(spark):
    # two distinct duplicated 3-windows overlap in doc 1 -> ONE span
    docs = [
        (1, "a b c d e x y z"),
        (2, "q a b c d r s t"),  # shares "a b c d"
        (3, "u b c d e v w m"),  # shares "b c d e"
    ]
    got = [g for g in _spans(spark, docs, min_len=3) if g[0] == 1]
    assert got == [(1, 0, 5, "a b c d e")]


def test_repeat_inside_one_document_counts(spark):
    docs = [(1, "x y z pad1 pad2 x y z end"), (2, "totally different tokens here")]
    got = _spans(spark, docs, min_len=3)
    assert (1, 0, 3, "x y z") in got and (1, 5, 3, "x y z") in got


def test_null_and_short_texts_emit_nothing(spark):
    docs = [(1, None), (2, "a b"), (3, "a b")]
    assert _spans(spark, docs, min_len=3) == []


def test_matches_bruteforce_all_lengths_on_random_corpus(spark):
    rng = random.Random(907)
    vocab = [f"w{k}" for k in range(12)]
    docs = []
    for i in range(14):
        n = rng.randint(4, 18)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    docs.append((99, None))
    for min_len in (3, 4):
        got = _spans(spark, docs, min_len=min_len)
        want = _brute_removal_cover(docs, min_len=min_len, min_count=2)
        assert got == want, f"min_len={min_len}"


def test_remove_duplicate_substrings_cuts_exactly_the_spans(spark):
    from datapipelines_spark.operators.dedup import remove_duplicate_substrings

    docs = [
        (1, "intro words alpha beta gamma delta epsilon zeta outro"),
        (2, "alpha beta gamma delta epsilon zeta and unique tail"),
        (3, "untouched text with no duplicates at all"),
        (4, None),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        r["id"]: (r["clean_text"], r["n_removed_tokens"])
        for r in remove_duplicate_substrings(
            df, "text", "id", min_len=3, min_count=2
        ).collect()
    }
    assert got[1] == ("intro words outro", 6)
    assert got[2] == ("and unique tail", 6)
    assert got[3] == ("untouched text with no duplicates at all", 0)
    assert 4 not in got  # NULL text: out of the declared domain


def test_remove_fully_duplicated_doc_becomes_empty(spark):
    from datapipelines_spark.operators.dedup import remove_duplicate_substrings

    docs = [(1, "x y z w"), (2, "x y z w")]
    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        r["id"]: (r["clean_text"], r["n_removed_tokens"])
        for r in remove_duplicate_substrings(
            df, "text", "id", min_len=3, min_count=2
        ).collect()
    }
    assert got == {1: ("", 4), 2: ("", 4)}
