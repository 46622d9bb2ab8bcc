"""Interleaved within-session A/B of connected_components shapes.

Variants toggled via CC_SHAPE env (read at call time by the TEMP hook in
components.py): 'plain' (distinct's own (u,v) exchange) vs 'repart_v'
(pre-position the edge cache on hash(v)). Reports per-variant wall medians
and the Spark job count per invocation (statusTracker) — the ladder metric
the wall noise hides.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from datapipelines_spark.catalog import all_queries  # noqa: E402
from datapipelines_spark.functions.caching import release_persists  # noqa: E402
from datapipelines_spark.session import get_spark  # noqa: E402

qname = sys.argv[1] if len(sys.argv) > 1 else "dedup_clusters"
variants = (sys.argv[2] or "plain,repart_v").split(",") if len(sys.argv) > 2 else ["plain", "repart_v"]
repeats = int(os.environ.get("REPEATS", "5"))

spark = get_spark(app_name="profile-cc")
registry = all_queries()
registry["q1_pricing_summary"].builder(spark, sf_dir := "/root/testdata/sf0.1").count()
tracker = spark.sparkContext.statusTracker()

results = {v: [] for v in variants}
jobs = {v: [] for v in variants}
for r in range(repeats):
    for v in variants:
        os.environ["CC_SHAPE"] = v
        release_persists()
        spark.catalog.clearCache()
        j0 = len(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        registry[qname].builder(spark, sf_dir).count()
        results[v].append(round(time.perf_counter() - t0, 3))
        jobs[v].append(len(tracker.getJobIdsForGroup(None)) - j0)

for v in variants:
    med = sorted(results[v])[len(results[v]) // 2]
    print(f"{qname} [{v}]: median {med:.3f} all={results[v]} jobs={jobs[v]}", flush=True)
spark.stop()
