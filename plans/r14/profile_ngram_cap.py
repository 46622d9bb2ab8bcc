"""Interleaved A/B: ngram_jaccard_pairs doc-frequency cap as a
Window.partitionBy count (HEAD) vs the winnow-style partial-agg +
broadcast anti-join riding the persisted post-repartition index (r14
VERDICT #6 treatment, applied to the sibling operator).

Arms measured on dedup_ngram_jaccard (the operator alone) and
dedup_clusters (pairs + CC consumer). Equality asserted on collected rows.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

import datapipelines_spark.operators.dedup as dd  # noqa: E402
from datapipelines_spark.catalog import all_queries  # noqa: E402
from datapipelines_spark.functions.caching import (  # noqa: E402
    managed_persist,
    release_persists,
)
from datapipelines_spark.session import get_spark  # noqa: E402

_head_impl = dd.ngram_jaccard_pairs


def anti_ngram_jaccard_pairs(
    df, text_col, id_col, n=3, threshold=0.5, max_doc_freq=1000
):
    docs = managed_persist(dd.doc_shingles(df, text_col, id_col, n))
    sh = docs.select(F.col(id_col), F.explode("shingles").alias("s")).repartition("s")
    if max_doc_freq is not None:
        sh = managed_persist(sh)
        hot = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > max_doc_freq)
            .select("s")
        )
        sh = sh.join(F.broadcast(hot), "s", "left_anti")
    a = sh.select(F.col(id_col).alias("doc_a"), "s")
    b = sh.select(F.col(id_col).alias("doc_b"), "s")
    pairs = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = docs.select(F.col(id_col), F.col("n_sh"))
    sa = F.broadcast(sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a")))
    sb = F.broadcast(sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b")))
    j = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(j >= threshold)
        .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
    )


sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile-ngram-cap")
registry = all_queries()
registry["q1_pricing_summary"].builder(spark, sf_dir).count()
tracker = spark.sparkContext.statusTracker()

QUERIES = ["dedup_ngram_jaccard", "dedup_clusters"]
arms = {"head": _head_impl, "anti": anti_ngram_jaccard_pairs}

walls = {(q, a): [] for q in QUERIES for a in arms}
jobs = {(q, a): [] for q in QUERIES for a in arms}
results = {}
for rep in range(6):
    for q in QUERIES:
        for arm, impl in arms.items():
            dd.ngram_jaccard_pairs = impl
            release_persists()
            spark.catalog.clearCache()
            j0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            rows = registry[q].builder(spark, sf_dir).collect()
            walls[(q, arm)].append(round(time.perf_counter() - t0, 3))
            jobs[(q, arm)].append(len(tracker.getJobIdsForGroup(None)) - j0)
            if (q, arm) not in results:
                results[(q, arm)] = rows

dd.ngram_jaccard_pairs = _head_impl
for q in QUERIES:
    assert results[(q, "head")] == results[(q, "anti")], q
    print(f"{q}: results identical ({len(results[(q, 'head')])} rows)")
    for arm in arms:
        ws = walls[(q, arm)]
        med = sorted(ws)[len(ws) // 2]
        print(f"  [{arm}] median {med:.3f} all={ws} jobs={jobs[(q, arm)]}")
spark.stop()
