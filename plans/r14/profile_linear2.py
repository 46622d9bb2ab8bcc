"""Interleaved A/B: r13 HEAD logreg_train (in-plan n_docs, per-epoch eager
checkpoint) vs the r14 candidate (lab persisted once, n as literal, eager
checkpoint). Monkeypatches the operator between repeats."""

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402

import datapipelines_spark.operators.linear as linear  # noqa: E402
from datapipelines_spark.catalog import all_queries  # noqa: E402
from datapipelines_spark.functions.caching import release_persists  # noqa: E402
from datapipelines_spark.operators.linear import MICRO, rational_sigmoid  # noqa: E402
from datapipelines_spark.session import get_spark  # noqa: E402


def head_logreg_train(feats, labels, id_col, buckets=64, epochs=2, lr=0.5):
    spark = feats.sparkSession
    w = spark.range(buckets + 1).select(
        F.col("id").cast("bigint").alias("bucket"),
        F.lit(0).cast("bigint").alias("weight_micro"),
    )
    n_docs = labels.agg(F.count(F.lit(1)).alias("__n"))
    lab = labels.select(F.col(id_col), F.col("y").cast("int").alias("__y"))
    for _ in range(epochs):
        w = w.localCheckpoint(eager=True)
        z = (
            feats.join(F.broadcast(w), "bucket")
            .groupBy(id_col)
            .agg(F.sum(F.col("weight_micro") * F.col("cnt")).alias("__zmu"))
        )
        zd = F.col("__zmu").cast("double") / F.lit(float(MICRO))
        resid = lab.join(z, id_col).select(
            F.col(id_col),
            F.floor(
                (F.col("__y") - rational_sigmoid(zd)) * F.lit(float(MICRO))
            ).alias("__rmu"),
        )
        grad = (
            feats.join(resid, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("__rmu") * F.col("cnt")).alias("__gmu"))
        )
        w = (
            w.join(grad, "bucket", "left")
            .crossJoin(F.broadcast(n_docs))
            .select(
                "bucket",
                (
                    F.col("weight_micro")
                    + F.floor(
                        F.lit(float(lr))
                        * F.coalesce(F.col("__gmu"), F.lit(0)).cast("double")
                        / F.col("__n").cast("double")
                    )
                ).alias("weight_micro"),
            )
        )
    return w


new_logreg_train = linear.logreg_train
linear._LOCAL_WEIGHTS_MAX = 0  # candidate arm: checkpoint path

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile-linear2")
registry = all_queries()
registry["q1_pricing_summary"].builder(spark, sf_dir).count()
tracker = spark.sparkContext.statusTracker()

arms = {"head": head_logreg_train, "r14": new_logreg_train}
walls = {k: [] for k in arms}
jobs = {k: [] for k in arms}
for rep in range(6):
    for name, fn in arms.items():
        linear.logreg_train = fn
        release_persists()
        spark.catalog.clearCache()
        j0 = len(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        registry["quality_linear_classifier"].builder(spark, sf_dir).count()
        walls[name].append(round(time.perf_counter() - t0, 3))
        jobs[name].append(len(tracker.getJobIdsForGroup(None)) - j0)

for name in arms:
    med = sorted(walls[name])[len(walls[name]) // 2]
    print(f"linear [{name}]: median {med:.3f} all={walls[name]} jobs={jobs[name]}", flush=True)
spark.stop()
