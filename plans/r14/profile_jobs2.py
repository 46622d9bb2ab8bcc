"""Per-job durations + callsites for one warm query invocation, via the
Spark UI REST API. Usage: python plans/r14/profile_jobs2.py <query> [warms]"""

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

qname = sys.argv[1]
warms = int(sys.argv[2]) if len(sys.argv) > 2 else 2
sf_dir = "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .appName("profile-jobs2")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "4055")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from datapipelines_spark.catalog import all_queries  # noqa: E402
from datapipelines_spark.functions.caching import release_persists  # noqa: E402

registry = all_queries()
registry["q1_pricing_summary"].builder(spark, sf_dir).count()
for _ in range(warms):
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

app_id = spark.sparkContext.applicationId
url = f"http://localhost:4055/api/v1/applications/{app_id}/jobs?status=succeeded"
jobs = json.load(urllib.request.urlopen(url))
rows = []
for j in jobs:
    if j["jobId"] not in before and j["jobId"] != min(before or {0}):
        t_sub = j["submissionTime"]
        t_done = j["completionTime"]
        rows.append((j["jobId"], t_sub, t_done, j.get("description", j["name"])[:140]))
rows.sort()
print(f"=== {qname}: wall {wall:.3f}s, {len([r for r in rows])} jobs ===", flush=True)
from datetime import datetime

def ts(s):
    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")

t_first = ts(rows[0][1]) if rows else None
prev_end = None
for jid, sub, done, desc in rows:
    dur = (ts(done) - ts(sub)).total_seconds()
    start = (ts(sub) - t_first).total_seconds()
    gap = (ts(sub) - prev_end).total_seconds() if prev_end else 0.0
    prev_end = max(prev_end, ts(done)) if prev_end else ts(done)
    print(f"job {jid:4d} +{start:7.3f}s gap={gap:6.3f}s dur={dur:6.3f}s  {desc}")
spark.stop()
