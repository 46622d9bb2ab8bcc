"""End-to-end training-corpus preparation: the 100 TB workflow at toy scale.

URL governance (parse -> registrable-domain blocklist -> per-domain quota)
-> quality filter (heuristic + Gopher rule bundle + compression-ratio
+ learned NB gate + bigram-LM perplexity gate + per-language length
winsorization report)
-> exact dedup -> variable-length exact-substring cut (Lee et al.)
-> near-dup dedup (MinHash+LSH clusters)
-> repeated-span report (corpus-frequent 5-grams)
-> winnowing local-match audit -> embedding near-dup (IVF-prefiltered GEMM)
-> SemDeDup (k-means cells + within-cell cosine)
-> benchmark decontamination (Bloom bitmap, the beyond-broadcast path)
-> heavy-hitter token report -> length-weighted budget subsample
-> token-budget best-first selection -> sequence packing -> summary
-> day-2 ingest: incremental dedup verdicts for a new batch probed against
the standing corpus (nobody re-dedups 100 TB per ingest).

Every stage is a composable DataFrame operator from datapipelines_spark
(the same ones the oracle-checked catalog queries use), so this script is
also the "a user of the reference could switch" demonstration: point it at
a documents table and it emits a packed, deduplicated, decontaminated
corpus.

Run:  python examples/corpus_prep.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelines_spark.operators.components import duplicate_clusters
from datapipelines_spark.operators.dedup import (
    MinHashConfig,
    drop_exact_duplicates,
    minhash_lsh_pairs,
)
from datapipelines_spark.operators.bloom import contamination_overlap_bloom
from datapipelines_spark.operators.nbayes import nb_score, nb_token_weights
from datapipelines_spark.operators.packing import pack_sequences, pack_summary
from datapipelines_spark.operators.text import compression_ratio_signal, quality_score
from datapipelines_spark.session import get_spark
from datapipelines_spark.sources.parquet import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="corpus_prep", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 0. URL governance: parse each document's source URL, drop blocklisted
    #    registrable domains, and cap any single domain's share (the fixture
    #    has no URL column, so plant one deterministically from doc_id —
    #    swap for the real column in production)
    from datapipelines_spark.operators.urls import (
        domain_blocklist_flag,
        domain_quota_sample,
        parse_urls,
        registrable_domain,
    )

    hosts = ["news.example.com", "shop.retail.co.uk", "cdn.mirror.net",
             "blog.spam.net", "docs.example.org", "tracker.spam.net"]
    host = F.element_at(
        F.array(*[F.lit(h) for h in hosts]), (F.col("doc_id") % 6 + 1).cast("int")
    )
    with_url = docs.withColumn(
        "url", F.concat(F.lit("https://"), host, F.lit("/d/"), F.col("doc_id"))
    )
    parsed = parse_urls(with_url, "url").withColumn(
        "domain", registrable_domain(F.col("host"))
    )
    gated = domain_blocklist_flag(parsed, "domain", ("spam.net",)).where(
        ~F.col("is_blocked")
    )
    docs = domain_quota_sample(gated, "domain", "doc_id", cap=150).select(
        docs.columns
    )
    n0a = docs.count()

    # 1. quality gate: length/punctuation/stopword heuristics
    quality = quality_score(docs, text_col="text", id_col="doc_id")
    docs = docs.join(
        quality.where(F.col("quality_score") >= 0.5).select("doc_id"), "doc_id"
    )
    n1 = docs.count()

    # 1a'. Gopher rule bundle: word count, mean word length, repetition,
    #      distinct ratio, stop-word presence — each an integer-exact rule
    from datapipelines_spark.operators.text import gopher_quality_rules

    gopher = gopher_quality_rules(docs, text_col="text", id_col="doc_id")
    docs = docs.join(gopher.where(F.col("passes_all")).select("doc_id"), "doc_id")
    n1a = docs.count()

    # 1a''. per-language length winsorization: report (not drop) length
    #       outliers — the numeric-cleaning view of the same corpus
    from datapipelines_spark.operators.checks import winsorize

    n_len_outliers = (
        winsorize(docs, value_col="n_chars", group_col="lang", id_col="doc_id")
        .where("is_outlier")
        .count()
    )

    # 1b. compression-ratio gate: templated spam compresses to almost
    #     nothing, binary noise barely compresses — keep the middle band
    ratio = compression_ratio_signal(docs, text_col="text", id_col="doc_id")
    docs = docs.join(
        ratio.where(F.col("compressed_ratio").between(0.2, 1.0)).select("doc_id"),
        "doc_id",
    )

    # 1c. learned quality gate: an in-plan Naive Bayes classifier trained on
    #     the lang label as a stand-in for a quality label — the model-based
    #     filter stage, no Python in the loop
    weights = nb_token_weights(docs, "text", F.col("lang") == "en", "doc_id")
    scores = nb_score(docs, weights, "text", "doc_id")
    n1b = docs.count()

    # 1d. perplexity gate (CCNet recipe): average bigram log-likelihood
    #     under an LM trained on the clean slice; far-out-of-distribution
    #     docs are boilerplate / wrong-language candidates
    from datapipelines_spark.operators.lm import bigram_lm_score

    lm = bigram_lm_score(docs, docs.where(F.col("lang") == "en"), "text", "doc_id")
    docs = docs.join(
        lm.where(F.col("avg_logp") > -12.0).select("doc_id"), "doc_id"
    )
    n1c = docs.count()

    # 2. exact dedup (content hash, min-id survivor)
    docs = drop_exact_duplicates(docs, text_col="text", id_col="doc_id")
    n2 = docs.count()

    # 2b. the Lee-et-al cut: remove every substring of >= 8 tokens that
    #     occurs >= 2 times corpus-wide (variable-length exact-substring
    #     dedup) BEFORE near-dup, so shared boilerplate cannot manufacture
    #     fake near-duplicates downstream
    from datapipelines_spark.operators.dedup import remove_duplicate_substrings

    cut = remove_duplicate_substrings(
        docs, text_col="text", id_col="doc_id", min_len=8, min_count=2
    )
    n_cut_tokens = cut.agg(F.sum("n_removed_tokens")).collect()[0][0]
    docs = (
        docs.drop("text")
        .join(cut.select("doc_id", F.col("clean_text").alias("text")), "doc_id")
        .where(F.col("text") != "")
        # every downstream stage re-reads the corpus several times; cut the
        # window-heavy span lineage off here (materialize-before-multiconsumer)
        .localCheckpoint(eager=True)
    )
    n2b = docs.count()

    # 3. near-dup dedup: MinHash+LSH pairs -> connected components -> keep
    #    the canonical (min-id) member of each cluster
    pairs = minhash_lsh_pairs(
        docs, text_col="text", id_col="doc_id", config=MinHashConfig(16, 4, 3)
    )
    clusters = duplicate_clusters(pairs)
    drop = clusters.where(~F.col("is_canonical")).select(
        F.col("node").alias("doc_id")
    )
    docs = docs.join(drop, "doc_id", "left_anti")
    n3 = docs.count()

    # 3a. repeated-span sweep: drop documents more than half covered by
    #     corpus-frequent 5-grams (fixed-granularity exact-substring dedup)
    from datapipelines_spark.operators.dedup import repeated_ngram_span_stats

    spans = repeated_ngram_span_stats(docs, "text", "doc_id", n=5, min_count=2)
    docs = docs.join(
        spans.where(F.col("dup_permille") > 500).select("doc_id"),
        "doc_id",
        "left_anti",
    )
    n3a = docs.count()

    # 3a'. local-match audit: winnowing fingerprints witness shared runs of
    #      >= 10 consecutive tokens (sub-document boilerplate the doc-level
    #      passes above cannot see; heavy sharers feed the CDC chunk dedup)
    from datapipelines_spark.operators.fingerprint import fingerprint_overlap_pairs

    n_local_pairs = fingerprint_overlap_pairs(
        docs, "text", "doc_id", k=7, window=4, min_shared=2
    ).count()

    # 3b. embedding-level near-dup: IVF cells prefilter the exact GEMM so
    #     work is sum of squared cell sizes, not n^2 (prefilter='ivf')
    from datapipelines_spark.operators.dedup import embedding_cosine_pairs_blocked

    emb = load_table(spark, sf_dir, "embeddings")
    emb_pairs = embedding_cosine_pairs_blocked(
        emb, "embedding", "vec_id", threshold=0.45, prefilter="ivf",
        n_cells=16, probes=4,
    )
    n_emb_pairs = emb_pairs.count()

    # 3c. SemDeDup: k-means cells + within-cell cosine, smallest-id
    #     survivor — the candidate work is sum |cell|^2, never n^2
    from datapipelines_spark.operators.dedup import semantic_dedup

    n_sem_dropped = (
        semantic_dedup(emb, "embedding", "vec_id", k=8, threshold=0.45)
        .where("NOT is_kept")
        .count()
    )

    # 4. decontamination vs a held-out eval slice (here: doc_id % 97 == 0),
    #    via the Bloom bitmap — the path that works when the eval n-gram set
    #    no longer fits a broadcast
    is_eval = F.col("doc_id") % 97 == 0
    contaminated = contamination_overlap_bloom(
        docs.where(~is_eval), docs.where(is_eval), "text", "doc_id",
        n=5, min_overlap=1, fpp=1e-6,
    ).select("doc_id")
    docs = docs.where(~is_eval).join(contaminated, "doc_id", "left_anti")
    n4 = docs.count()

    # 4b. corpus health report: exact heavy-hitter tokens (find-then-verify,
    #     no full-vocabulary shuffle) — runaway boilerplate tokens show here
    from datapipelines_spark.operators.sketch import heavy_hitters

    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    n_heavy = heavy_hitters(toks, "token", support=0.01).count()

    # 4c. budget subsample: draw a fixed-size training subset with
    #     probability proportional to length (Efraimidis-Spirakis, retry-
    #     stable) — swap the weight for a quality score in production
    from datapipelines_spark.operators.mixing import weighted_sample_topk

    subset = weighted_sample_topk(
        docs.withColumn("n_chars", F.length("text")), "n_chars", "doc_id",
        k=max(1, n4 // 2),
    )
    docs = subset.drop("sample_key", "n_chars") if n4 > 4 else docs
    n4b = docs.count()

    # 4d. token-budget best-first selection: spend a fixed token budget on
    #     the highest-quality docs (exact running-sum prefix, no global
    #     sort — the boundary score bucket alone pays a window)
    from datapipelines_spark.operators.mixing import token_budget_select

    words = F.split(F.col("text"), " ")
    scored = docs.select(
        "*",
        F.size(words).cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct(words)) * F.lit(1.0) / F.size(words)).alias(
            "__score"
        ),
    )
    budget = max(256, n4b * 20)
    docs = token_budget_select(
        scored, score_col="__score", tokens_col="n_tokens", id_col="doc_id",
        budget=budget,
    ).drop("__score", "n_tokens")
    n4d = docs.count()

    # 5. sequence packing: 2048-token packs per source
    packed = pack_sequences(
        docs.select(
            "source",
            "doc_id",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        ),
        "n_tokens",
        "doc_id",
        budget=2048,
        partition_cols=("source",),
    )
    summary = pack_summary(packed, "n_tokens", ("source",))
    n_packs = summary.count()

    # 6. day-2 ingest: new documents are NOT deduped by re-running the whole
    #    pipeline over corpus+batch — the batch is probed against the
    #    standing corpus (exact md5 + minhash bands, both persistable as an
    #    index) and against itself, and only `keep` rows enter. Here the
    #    "new batch" is synthesized from the corpus so every verdict class
    #    fires: exact copies, near copies (tail appended), and fresh docs.
    from datapipelines_spark.operators.dedup import incremental_dedup_verdicts

    from pyspark.sql import Window as W

    ranked_docs = docs.limit(200).withColumn(
        "__rn", F.row_number().over(W.orderBy("doc_id"))
    )
    batch = ranked_docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.when(F.col("__rn") % 3 == 0, F.col("text"))  # exact corpus dup
        .when(F.col("__rn") % 3 == 1, F.concat(F.col("text"), F.lit(" qq zz")))
        .otherwise(F.concat(F.lit("fresh "), F.reverse(F.col("text"))))
        .alias("text"),
    )
    verdicts = incremental_dedup_verdicts(
        docs, batch, "text", "doc_id", MinHashConfig(), threshold=0.5
    )
    ingest_counts = {
        r["verdict"]: r["n"]
        for r in verdicts.groupBy("verdict").agg(F.count("*").alias("n")).collect()
    }

    print(f"documents:        {n0}")
    print(f"after URL gate:   {n0a} (blocklist + per-domain quota)")
    print(f"after quality:    {n1}")
    print(f"after gopher:     {n1a} (length outliers flagged: {n_len_outliers})")
    print(f"after ratio+NB:   {n1b} (NB-scored: {scores.count()})")
    print(f"after perplexity: {n1c}")
    print(f"embedding pairs:  {n_emb_pairs} (IVF-prefiltered)")
    print(f"local-match pairs:{n_local_pairs} (winnowing)")
    print(f"after exact dedup:{n2}")
    print(f"after substr cut: {n2b} ({n_cut_tokens} duplicated tokens removed)")
    print(f"after near-dup:   {n3}")
    print(f"after span sweep: {n3a} (SemDeDup would drop {n_sem_dropped} vecs)")
    print(f"after decontam:   {n4}")
    print(f"heavy tokens >1%: {n_heavy}")
    print(f"after subsample:  {n4b} (length-weighted)")
    print(f"after budget cut: {n4d} (best-first, {budget} tokens)")
    print(f"packs (2048 tok): {n_packs}")
    print(f"day-2 ingest:     {ingest_counts} (only `keep` rows enter)")
    summary.orderBy("source", "pack_id").show(10, truncate=False)


if __name__ == "__main__":
    main()
