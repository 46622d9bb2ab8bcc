"""Differential fuzz for incremental_dedup_verdicts (operators/dedup.py):
random tiny corpora from a collision-heavy vocabulary, the operator's
verdict table vs a LITERAL Python replica of the whole decision procedure
(md5 equality, >=n-word gate, first-occurrence-distinct shingles, portable
minhash, band buckets, exact-jaccard verification, precedence) — so a
banding or precedence bug can't hide between the hand-written catalog
cases."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelines_spark.operators.dedup import (
    MERSENNE_PRIME,
    MinHashConfig,
    incremental_dedup_verdicts,
)

_CFG = MinHashConfig(num_hashes=8, bands=4, ngram=3)
_THRESHOLD = 0.5
_VOCAB = ["aa", "bb", "cc", "dd"]

_doc = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=6).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=10)
_batch = st.lists(_doc, min_size=1, max_size=8)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def _shingles(text: str) -> list[str]:
    words = text.split(" ")
    n = _CFG.ngram
    return list(
        dict.fromkeys(" ".join(words[i : i + n]) for i in range(len(words) - n + 1))
    )


def _bands(text: str):
    sh = _shingles(text)
    if not sh:
        return []
    hs = [_h32(s) for s in sh]
    sig = [
        min((a * h + b) % MERSENNE_PRIME for h in hs)
        for a, b in _CFG.coefficients()
    ]
    rows = _CFG.num_hashes // _CFG.bands
    return [
        (
            b,
            hashlib.md5(
                "-".join(str(sig[i]) for i in range(b * rows, (b + 1) * rows)).encode()
            ).hexdigest(),
        )
        for b in range(_CFG.bands)
    ]


def _jaccard(ta: str, tb: str) -> float:
    a, b = set(_shingles(ta)), set(_shingles(tb))
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter) if (a or b) else 0.0


def _replay(corpus: list[tuple[int, str]], batch: list[tuple[int, str]]):
    """Literal Python decision table."""
    ch: dict[str, int] = {}
    for i, t in corpus:
        h = hashlib.md5(t.encode()).hexdigest()
        ch[h] = min(ch.get(h, i), i)
    cb = {i: _bands(t) for i, t in corpus}
    bb = {i: _bands(t) for i, t in batch}
    ctext = dict(corpus)
    btext = dict(batch)
    out = {}
    for i, t in sorted(batch):
        h = hashlib.md5(t.encode()).hexdigest()
        exact_corpus = ch.get(h)
        earlier_same = [
            j for j, tj in batch if j < i and hashlib.md5(tj.encode()).hexdigest() == h
        ]
        exact_batch = min(earlier_same) if earlier_same else None
        near_c = [
            j
            for j in ctext
            if set(cb[j]) & set(bb[i]) and _jaccard(ctext[j], t) >= _THRESHOLD
        ]
        near_corpus = min(near_c) if near_c else None
        near_b = [
            j
            for j in btext
            if j < i and set(bb[j]) & set(bb[i]) and _jaccard(btext[j], t) >= _THRESHOLD
        ]
        near_batch = min(near_b) if near_b else None
        if exact_corpus is not None:
            out[i] = ("exact_corpus", exact_corpus)
        elif exact_batch is not None:
            out[i] = ("exact_batch", exact_batch)
        elif near_corpus is not None:
            out[i] = ("near_corpus", near_corpus)
        elif near_batch is not None:
            out[i] = ("near_batch", near_batch)
        else:
            out[i] = ("keep", None)
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None)
@given(corpus_texts=_corpus, batch_texts=_batch)
def test_verdicts_match_literal_python_replay(spark, corpus_texts, batch_texts):
    corpus = [(2 * i + 1, t) for i, t in enumerate(corpus_texts)]  # odd ids
    batch = [(2 * i, t) for i, t in enumerate(batch_texts)]  # even ids
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(batch, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["verdict"], r["match_id"])
        for r in incremental_dedup_verdicts(
            cdf, bdf, "text", "doc_id", _CFG, threshold=_THRESHOLD
        ).collect()
    }
    assert got == _replay(corpus, batch)
