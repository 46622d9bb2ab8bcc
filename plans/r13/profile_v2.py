"""Stage breakdown of corpus_clean_pipeline_v2: time each stage in
isolation (fresh cache per stage group), then the full query, to locate
where the wall concentrates. Diagnostic only — not part of the bench.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from datapipelines_spark.catalog import all_queries  # noqa: E402
from datapipelines_spark.functions.caching import release_persists  # noqa: E402
from datapipelines_spark.operators import dedup as dd  # noqa: E402
from datapipelines_spark.operators.components import duplicate_clusters  # noqa: E402
from datapipelines_spark.queries.dedup import _planted_corpus  # noqa: E402
from datapipelines_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="profile-v2")
registry = all_queries()
registry["q1_pricing_summary"].builder(spark, sf_dir).count()  # warm-up


def t(label, fn, n=3):
    times = []
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"{label:38s} {med:7.3f}s  all={[round(x, 3) for x in times]}  -> {out}")
    return out


def fresh():
    release_persists()
    spark.catalog.clearCache()


# stage 1: planted corpus scan
fresh()
t("planted.count", lambda: _planted_corpus(spark, sf_dir).count())

# stage 2: substring cut alone (cold each repeat, incl. localCheckpoint)
def cut_cold():
    fresh()
    d = _planted_corpus(spark, sf_dir)
    return dd.remove_duplicate_substrings(
        d, "text", "doc_id", min_len=8, min_count=2
    ).localCheckpoint(eager=True).count()

t("cut+localCheckpoint (cold)", cut_cold)

# stage 3: jaccard pairs + clusters over a checkpointed cleaned table
fresh()
d = _planted_corpus(spark, sf_dir)
cleaned = dd.remove_duplicate_substrings(
    d, "text", "doc_id", min_len=8, min_count=2
).localCheckpoint(eager=True)
t(
    "jaccard pairs over cleaned",
    lambda: dd.ngram_jaccard_pairs(
        cleaned.select("doc_id", F.col("clean_text").alias("text")),
        "text", "doc_id", n=3, threshold=0.5,
    ).count(),
)
t(
    "clusters(pairs) over cleaned",
    lambda: duplicate_clusters(
        dd.ngram_jaccard_pairs(
            cleaned.select("doc_id", F.col("clean_text").alias("text")),
            "text", "doc_id", n=3, threshold=0.5,
        )
    ).count(),
)

# stage 4: quality + exact windows over planted
fresh()
d = _planted_corpus(spark, sf_dir)
toks = F.split(F.col("text"), " ")
t(
    "quality gate",
    lambda: d.select(
        "doc_id",
        ((F.size(toks) >= 10) & (F.size(F.array_distinct(toks)) / F.size(toks) >= 0.2)).alias("q"),
    ).count(),
)
w = Window.partitionBy(F.md5("text"))
t(
    "exact canon window",
    lambda: d.select(
        "doc_id", (F.col("doc_id") == F.min("doc_id").over(w)).alias("e")
    ).count(),
)

# full query, bench protocol
def full_cold():
    fresh()
    return registry["corpus_clean_pipeline_v2"].builder(spark, sf_dir).count()

t("FULL v2 (cold each repeat)", full_cold)

# full query, warm repeats (bench measures repeats sharing persists)
fresh()
t("FULL v2 (warm repeats)", lambda: registry["corpus_clean_pipeline_v2"].builder(spark, sf_dir).count(), n=5)

release_persists()
spark.catalog.clearCache()
spark.stop()
