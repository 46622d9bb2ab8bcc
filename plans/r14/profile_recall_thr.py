"""Interleaved A/B: sim_recall_harness with SERIAL family builds (HEAD)
vs THREADED family builds (guide §2.6 — overlap independent jobs).

The harness's five independent arms (exact brute force, the shared IVF
multiprobe table, IVF+SQ8, PQ, flat SQ8) each run blocking driver jobs at
plan-BUILD time (router count probes, sq8_fit min/max collects, the fused
pq_fit partials, query-code collects) — ~8 serial jobs today. The arms
are independent until the final union, so building them from a small
thread pool overlaps those jobs. The assembled plan is IDENTICAL (same
spec order, same union); only build-time job overlap changes.

Equality: first rep of each arm collects the full 7-row result and the
script asserts they match exactly.
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402
from pyspark import inheritable_thread_target  # noqa: E402

from datapipelines_spark.catalog import _REGISTRY, all_queries  # noqa: E402
from datapipelines_spark.functions import caching  # noqa: E402
from datapipelines_spark.functions.caching import (  # noqa: E402
    managed_persist,
    release_persists,
)
from datapipelines_spark.queries.recall import _IVF_PROBES, _family_specs  # noqa: E402
from datapipelines_spark.session import get_spark  # noqa: E402

# --- thread-safe registry shim (the repo change would add this lock) -------
import threading  # noqa: E402

_reg_lock = threading.Lock()
_orig_managed_persist = caching.managed_persist


def locked_managed_persist(df):
    with _reg_lock:
        return _orig_managed_persist(df)


def thr_sim_recall_harness(spark, sf_dir):
    from datapipelines_spark.queries.vectors import ivf_topk_multiprobe

    specs = _family_specs()

    def build_exact():
        return managed_persist(
            _REGISTRY["sim_topk_bruteforce"]
            .builder(spark, sf_dir)
            .select("query_id", "neighbor_id")
        )

    def build_ivf():
        return ivf_topk_multiprobe(spark, sf_dir, _IVF_PROBES)

    fam_builders = {
        fam: b for fam, _s, b, _n in specs if not fam.startswith("ivf_p")
    }
    with ThreadPoolExecutor(max_workers=5) as pool:
        f_exact = pool.submit(inheritable_thread_target(build_exact))
        f_ivf = pool.submit(inheritable_thread_target(build_ivf))
        f_fam = {
            fam: pool.submit(
                inheritable_thread_target(lambda b=b: b(spark, sf_dir))
            )
            for fam, b in fam_builders.items()
        }
        exact = f_exact.result()
        ivf_arms = f_ivf.result()
        fams = {fam: f.result() for fam, f in f_fam.items()}

    tagged = None
    for fam, _sql, _builder, ncol in specs:
        if fam.startswith("ivf_p"):
            r = ivf_arms[int(fam[len("ivf_p"):])]
        else:
            r = fams[fam]
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


sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile-recall-thr")
registry = all_queries()
registry["q1_pricing_summary"].builder(spark, sf_dir).count()
tracker = spark.sparkContext.statusTracker()

caching.managed_persist = locked_managed_persist
# the repo module imported managed_persist by name in queries.recall /
# queries.vectors — patch those references too so both arms use the lock
import datapipelines_spark.queries.recall as qrecall  # noqa: E402
import datapipelines_spark.queries.vectors as qvec  # noqa: E402

qvec.managed_persist = locked_managed_persist

arms = {
    "head": lambda: qrecall.sim_recall_harness.__wrapped__(spark, sf_dir)
    if hasattr(qrecall.sim_recall_harness, "__wrapped__")
    else registry["sim_recall_harness"].builder(spark, sf_dir),
    "thr": lambda: thr_sim_recall_harness(spark, sf_dir),
}

results = {}
walls = {a: [] for a in arms}
jobs = {a: [] for a in arms}
for rep in range(6):
    for arm, build in arms.items():
        release_persists()
        spark.catalog.clearCache()
        j0 = len(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        df = build()
        rows = df.collect()
        walls[arm].append(round(time.perf_counter() - t0, 3))
        jobs[arm].append(len(tracker.getJobIdsForGroup(None)) - j0)
        if arm not in results:
            results[arm] = rows

assert results["head"] == results["thr"], (
    results["head"],
    results["thr"],
)
print("results identical:", [tuple(r) for r in results["head"]])
for arm in arms:
    ws = walls[arm]
    med = sorted(ws)[len(ws) // 2]
    print(f"sim_recall_harness [{arm}]: median {med:.3f} all={ws} jobs={jobs[arm]}")
spark.stop()
