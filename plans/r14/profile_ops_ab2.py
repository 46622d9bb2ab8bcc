"""Interleaved HEAD-vs-r14 A/B, batch 2: the fused contamination_overlap
(decontaminate_ngram_overlap) and the persisted gram-hash table in
duplicate_substring_spans (dedup_substring_spans, dedup_substring_removal,
corpus_clean_pipeline_v2). HEAD replicas are monkeypatched in for the
'head' arm; builders import the operators at call time, so each repeat
picks up the active arm."""

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

import datapipelines_spark.operators.dedup as dd  # noqa: E402
import datapipelines_spark.operators.text as text_ops  # noqa: E402
from datapipelines_spark.catalog import all_queries  # noqa: E402
from datapipelines_spark.functions.caching import release_persists  # noqa: E402
from datapipelines_spark.session import get_spark  # noqa: E402

# --- HEAD replicas ---------------------------------------------------------


def head_contamination_overlap(
    train, eval_df, text_col, id_col, n=5, min_overlap=3
):
    from datapipelines_spark.operators.dedup import word_shingles

    tr = word_shingles(train, text_col, id_col, n)
    ev = word_shingles(eval_df, text_col, id_col, n).select("s").distinct()
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .where(F.col("n_overlap") >= min_overlap)
    )


def head_duplicate_substring_spans(df, text_col, id_col, min_len=8, min_count=2):
    win = Window.partitionBy(id_col).orderBy("pos")
    df = df.where(F.col(text_col).isNotNull())
    words = F.split(F.col(text_col), " ")
    toks = df.select(F.col(id_col), words.alias("toks"))
    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - min_len),
        lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, min_len)),
    )
    pos = (
        toks.where(F.size("toks") >= min_len)
        .select(F.col(id_col), F.posexplode(grams).alias("pos", "gram"))
        .select(id_col, "pos", F.xxhash64("gram").alias("gh"))
    )
    freq = (
        pos.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .select("gh")
    )
    flagged = pos.join(freq, "gh").select(id_col, "pos")
    islands = flagged.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("pos") - F.lag("pos").over(win) <= min_len, F.lit(0)
            ).otherwise(F.lit(1))
        ).over(win),
    )
    spans = islands.groupBy(id_col, "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") - F.min("pos") + min_len).alias("span_len"),
    )
    return (
        spans.join(toks, id_col)
        .select(
            F.col(id_col),
            F.col("span_start").cast("bigint").alias("span_start"),
            F.col("span_len").cast("bigint").alias("span_len"),
            F.concat_ws(
                " ", F.slice("toks", F.col("span_start") + 1, F.col("span_len"))
            ).alias("span_text"),
        )
    )


new_impls = {
    "overlap": text_ops.contamination_overlap,
    "spans": dd.duplicate_substring_spans,
}
head_impls = {
    "overlap": head_contamination_overlap,
    "spans": head_duplicate_substring_spans,
}


def set_arm(arm):
    impls = head_impls if arm == "head" else new_impls
    text_ops.contamination_overlap = impls["overlap"]
    dd.duplicate_substring_spans = impls["spans"]


QUERIES = [
    "decontaminate_ngram_overlap",
    "dedup_substring_spans",
    "dedup_substring_removal",
    "corpus_clean_pipeline_v2",
]

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile-ops-ab2")
registry = all_queries()
registry["q1_pricing_summary"].builder(spark, sf_dir).count()
tracker = spark.sparkContext.statusTracker()

walls = {(q, a): [] for q in QUERIES for a in ("head", "r14")}
jobs = {(q, a): [] for q in QUERIES for a in ("head", "r14")}
rows = {}
for rep in range(6):
    for q in QUERIES:
        for arm in ("head", "r14"):
            set_arm(arm)
            release_persists()
            spark.catalog.clearCache()
            j0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            n = registry[q].builder(spark, sf_dir).count()
            walls[(q, arm)].append(round(time.perf_counter() - t0, 3))
            jobs[(q, arm)].append(len(tracker.getJobIdsForGroup(None)) - j0)
            rows[(q, arm)] = n
set_arm("r14")

for q in QUERIES:
    for arm in ("head", "r14"):
        ws = walls[(q, arm)]
        med = sorted(ws)[len(ws) // 2]
        print(
            f"{q} [{arm}]: median {med:.3f} all={ws} jobs={jobs[(q, arm)]} rows={rows[(q, arm)]}",
            flush=True,
        )
spark.stop()
