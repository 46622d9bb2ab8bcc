"""Interleaved HEAD-vs-r14 A/B for the bloom fusion, the URL distinct-IDN
join, and the winnow hot-key guard. HEAD replicas are monkeypatched in for
the 'head' arm; the queries import the operators inside their builders, so
each repeat picks up the active arm."""

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, Window  # noqa: E402

import datapipelines_spark.operators.bloom as bloom  # noqa: E402
import datapipelines_spark.operators.fingerprint as fingerprint  # noqa: E402
import datapipelines_spark.operators.urls as urls  # noqa: E402
from datapipelines_spark.catalog import all_queries  # noqa: E402
from datapipelines_spark.functions.caching import release_persists  # noqa: E402
from datapipelines_spark.session import get_spark  # noqa: E402

# --- HEAD replicas ---------------------------------------------------------


def head_contamination_overlap_bloom(
    train, eval_df, text_col, id_col, n=5, min_overlap=3, fpp=0.01, expected_items=None
):
    from datapipelines_spark.operators.dedup import word_shingles

    ev = word_shingles(eval_df, text_col, id_col, n).select("s")
    if expected_items is None:
        words = F.split(F.col(text_col), " ")
        bound = eval_df.select(
            F.sum(
                F.greatest(F.size(words) - F.lit(n - 1), F.lit(0)).cast("long")
            ).alias("__n")
        ).collect()[0][0]
        expected_items = int(bound or 0)
    num_bits = bloom.optimal_bits(expected_items, fpp)
    num_hashes = bloom.optimal_hashes(num_bits, expected_items)
    bits = bloom.build_bloom(ev, "s", num_bits, num_hashes)
    tr = word_shingles(train, text_col, id_col, n)
    hit = bloom.might_contain(
        bits, F.xxhash64(F.col("s")), num_bits, num_hashes, train.sparkSession
    )
    return (
        tr.where(hit)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .where(F.col("n_overlap") >= min_overlap)
    )


def head_fingerprint_overlap_pairs(
    df, text_col, id_col, k=7, window=4, min_shared=2, max_fp_docs=1000
):
    fps = fingerprint.winnow_fingerprints(df, text_col, id_col, k, window).repartition("fp")
    w = Window.partitionBy("fp")
    fps = (
        fps.withColumn("__nd", F.count(F.lit(1)).over(w))
        .where(F.col("__nd") <= max_fp_docs)
        .drop("__nd")
    )
    a = fps.select(F.col("fp"), F.col(id_col).alias("doc_a"))
    b = fps.select(F.col("fp"), F.col(id_col).alias("doc_b"))
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def head_parse_urls(df, url_col):
    u = F.col(url_col)
    authority = F.regexp_extract(u, urls._AUTHORITY_RE, 1)
    return df.withColumns(
        {
            "scheme": F.lower(F.regexp_extract(u, urls._SCHEME_RE, 1)),
            "host": urls.normalize_idn_host(
                F.lower(F.regexp_extract(authority, urls._HOST_RE, 1))
            ),
            "path": F.regexp_extract(u, urls._PATH_RE, 1),
            "query": F.regexp_extract(u, urls._QUERY_RE, 1),
        }
    )


new_impls = {
    "bloom": bloom.contamination_overlap_bloom,
    "fp": fingerprint.fingerprint_overlap_pairs,
    "urls": urls.parse_urls,
}
head_impls = {
    "bloom": head_contamination_overlap_bloom,
    "fp": head_fingerprint_overlap_pairs,
    "urls": head_parse_urls,
}


def set_arm(arm):
    impls = head_impls if arm == "head" else new_impls
    bloom.contamination_overlap_bloom = impls["bloom"]
    fingerprint.fingerprint_overlap_pairs = impls["fp"]
    urls.parse_urls = impls["urls"]


QUERIES = [
    "decontaminate_bloom",
    "dedup_winnow_fingerprints",
    "url_parse_documents",
    "domain_quota_sample_docs",
]

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile-ops-ab")
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

for q in QUERIES:
    for arm in ("head", "r14"):
        ws = walls[(q, arm)]
        med = sorted(ws)[len(ws) // 2]
        print(
            f"{q} [{arm}]: median {med:.3f} all={ws} jobs={jobs[(q, arm)]} rows={rows[(q, arm)]}",
            flush=True,
        )
spark.stop()
