"""Capture .explain('formatted') for sim_recall_harness: SERIAL arm
assembly (the pre-change shape, replicated verbatim from git HEAD~) vs the
THREADED build now in queries/recall.py. The claim being checked: the
thread pool changes only WHEN build-time driver jobs run, not the plan —
the two captures must be identical up to cache/exprId numbering.
Writes sim_recall_harness_{before,after}.txt and prints a normalized diff
summary."""

import re
import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from datapipelines_spark.catalog import _REGISTRY, all_queries  # noqa: E402
from datapipelines_spark.functions.caching import (  # noqa: E402
    managed_persist,
    release_persists,
)
from datapipelines_spark.queries.recall import _IVF_PROBES, _family_specs  # noqa: E402
from datapipelines_spark.session import get_spark  # noqa: E402


def serial_sim_recall_harness(spark, sf_dir):
    """Pre-change body (serial loop), replicated verbatim."""
    from datapipelines_spark.queries.vectors import ivf_topk_multiprobe

    exact = managed_persist(
        _REGISTRY["sim_topk_bruteforce"]
        .builder(spark, sf_dir)
        .select("query_id", "neighbor_id")
    )
    ivf_arms = ivf_topk_multiprobe(spark, sf_dir, _IVF_PROBES)
    specs = _family_specs()
    tagged = None
    for fam, _sql, builder, ncol in specs:
        if fam.startswith("ivf_p"):
            r = ivf_arms[int(fam[len("ivf_p"):])]
        else:
            r = builder(spark, sf_dir)
        r = r.where(
            (F.col("query_id") % 100 == 0) & (F.col(ncol) != F.col("query_id"))
        ).select(
            F.lit(fam).alias("family"),
            "query_id",
            F.col(ncol).alias("neighbor_id"),
        )
        tagged = r if tagged is None else tagged.unionByName(r)
    hits = (
        tagged.join(exact, ["query_id", "neighbor_id"])
        .groupBy("family")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = spark.createDataFrame([(f,) for f, _, _, _ in specs], "family string")
    nq = exact.agg(F.countDistinct("query_id").alias("__n"))
    return (
        base.join(hits, "family", "left")
        .na.fill({"n_hits": 0})
        .crossJoin(F.broadcast(nq))
        .select(
            "family",
            F.col("__n").cast("bigint").alias("n_queries"),
            F.col("n_hits").cast("bigint").alias("n_hits"),
            F.floor(F.col("n_hits") * 10000 / (F.col("__n") * 5))
            .cast("bigint")
            .alias("recall_bp"),
        )
        .orderBy("family")
    )


def norm(plan: str) -> list[str]:
    # exprIds, lambda variable numbering, RDD ids and AQE plan ids are
    # assigned by a global counter — they encode BUILD ORDER, not plan
    # shape; normalize them away so the diff shows structure only
    plan = re.sub(r"#\d+", "#N", plan)
    plan = re.sub(r"lambda ([a-z]+)_\d+", r"lambda \1_N", plan)
    plan = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[N]", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
    plan = re.sub(r"cachedPlan=.*", "cachedPlan=X", plan)
    return plan.splitlines()


sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="capture-recall-thr")
registry = all_queries()

release_persists()
spark.catalog.clearCache()
df_before = serial_sim_recall_harness(spark, sf_dir)
p_before = df_before._jdf.queryExecution().explainString(
    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
)
release_persists()
spark.catalog.clearCache()
df_after = registry["sim_recall_harness"].builder(spark, sf_dir)
p_after = df_after._jdf.queryExecution().explainString(
    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
)

open("plans/r14/sim_recall_harness_before.txt", "w").write(p_before)
open("plans/r14/sim_recall_harness_after.txt", "w").write(p_after)

nb, na = norm(p_before), norm(p_after)
if nb == na:
    print(f"plans IDENTICAL after exprId/plan_id normalization ({len(nb)} lines)")
else:
    import difflib

    d = list(difflib.unified_diff(nb, na, lineterm=""))
    print(f"plans differ: {len(d)} diff lines")
    for line in d[:60]:
        print(line)
spark.stop()
