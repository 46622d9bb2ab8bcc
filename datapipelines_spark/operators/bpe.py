"""Byte-pair-encoding subword tokenizer — trained and applied in-engine.

Token counting for corpus budgeting (functions/text.py) approximates with
whitespace/regex tokens; real training pipelines budget in SUBWORD tokens,
and sample-efficient filtering (e.g. fertility — subwords per word — as a
quality signal) needs the actual tokenizer. The classic BPE procedure
(Sennrich/Haddow/Birch, "Neural Machine Translation of Rare Words with
Subword Units", ACL 2016 — public) splits words into symbols and greedily
merges the most frequent adjacent pair:

  TRAIN — the corpus collapses to a WORD-FREQUENCY table first (one
  aggregate; this is how every production BPE trainer works — merges
  depend only on word counts, not word positions), bounded to the top
  ``max_words`` words by (count, word) via TakeOrderedAndProject so the
  driver-side merge loop works on a capped table no matter the corpus
  size. The loop itself is O(max_words · merges) pure Python over that
  capped table — model training, not data processing; the corpus is
  touched exactly once.

  ENCODE — merge ranks broadcast as a dict; one Arrow stage applies the
  standard lowest-rank-first merge loop per word, memoized per batch
  (natural-language batches repeat words heavily). Output stays (id,
  tokens array<string>) for downstream budgeting/packing.

Determinism: merge selection ties break on (count DESC, pair lexicographic)
— retries and repartitions cannot change the learned merges; encoding is a
pure function of (text, merges).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

END_OF_WORD = "</w>"


def word_counts(df: DataFrame, text_col: str, max_words: int) -> list[tuple[str, int]]:
    """Top ``max_words`` (word, count) pairs by (count DESC, word ASC) —
    TakeOrderedAndProject, never a full-vocabulary driver collect."""
    rows = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules from the corpus word frequencies.

    Returns the ordered merge list [(left, right), ...]; rule i merges the
    adjacent symbol pair (left, right) into left+right. Words carry an
    explicit END_OF_WORD marker symbol, so learned units respect word
    boundaries (the original formulation)."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (END_OF_WORD,): c for w, c in word_counts(df, text_col, max_words)
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for symbols, c in vocab.items():
            for i in range(len(symbols) - 1):
                p = (symbols[i], symbols[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == best[0]
                    and symbols[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    symbols = list(word) + [END_OF_WORD]
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, tokens array<string>): the text's subword tokens under the
    learned merges — one Arrow stage, per-batch word memoization, merge
    ranks broadcast once."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {tuple(p): i for i, p in enumerate(merges)}
    )
    schema = T.StructType(
        [
            T.StructField("__id", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
        ]
    )

    def encode(batches):
        ranks = bc.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            ids, toks = [], []
            for i, t in zip(pdf["__id"], pdf["__text"]):
                if t is None:
                    continue
                out: list[str] = []
                for w in t.split(" "):
                    if w == "":
                        continue
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        memo[w] = enc
                    out.extend(enc)
                ids.append(int(i))
                toks.append(out)
            yield pd.DataFrame({"__id": ids, "tokens": toks})

    proj = df.select(
        F.col(id_col).cast("long").alias("__id"), F.col(text_col).alias("__text")
    )
    return proj.mapInPandas(encode, schema).withColumnRenamed("__id", id_col)
