"""Dump the per-job breakdown of one query invocation: job id, stage count,
task count, and the first stage name — the ladder map (guide §1.2)."""

import sys
import time

sys.path.insert(0, "/root/repo")

from datapipelines_spark.catalog import all_queries  # noqa: E402
from datapipelines_spark.functions.caching import release_persists  # noqa: E402
from datapipelines_spark.session import get_spark  # noqa: E402

qname = sys.argv[1]
sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile-jobs")
registry = all_queries()
registry["q1_pricing_summary"].builder(spark, sf_dir).count()

# warm twice so JIT noise doesn't drown the ladder
for _ in range(2):
    release_persists()
    spark.catalog.clearCache()
    registry[qname].builder(spark, sf_dir).count()

release_persists()
spark.catalog.clearCache()
tracker = spark.sparkContext.statusTracker()
before = set(tracker.getJobIdsForGroup(None))
t0 = time.perf_counter()
registry[qname].builder(spark, sf_dir).count()
wall = time.perf_counter() - t0
jobs = sorted(set(tracker.getJobIdsForGroup(None)) - before)
print(f"{qname}: {wall:.3f}s, {len(jobs)} jobs", flush=True)
for j in jobs:
    info = tracker.getJobInfo(j)
    if info is None:
        print(f"  job {j}: <gone>")
        continue
    stages = [tracker.getStageInfo(s) for s in info.stageIds]
    names = {s.name.split(" at ")[0] for s in stages if s is not None}
    ntasks = sum(s.numTasks for s in stages if s is not None)
    print(f"  job {j}: {len(info.stageIds)} stages, {ntasks} tasks, {sorted(names)}")
spark.stop()
