"""Isolate connected_components' own job ladder from the pairs pipeline:
materialize the pair list first, then profile CC over it."""

import json
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .appName("profile-cc-iso")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "4056")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import datapipelines_spark.operators.dedup as dd  # noqa: E402
from datapipelines_spark.operators.components import connected_components  # noqa: E402
from datapipelines_spark.sources.parquet import load_table  # noqa: E402

sf_dir = "/root/testdata/sf0.1"
d = load_table(spark, sf_dir, "documents")
pairs = dd.ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.5).localCheckpoint()
print("pairs materialized:", pairs.count(), flush=True)

tracker = spark.sparkContext.statusTracker()

for rep in range(3):
    before = set(tracker.getJobIdsForGroup(None))
    t0 = time.perf_counter()
    n = connected_components(pairs).count()
    wall = time.perf_counter() - t0
    jobs = sorted(set(tracker.getJobIdsForGroup(None)) - before)
    print(f"CC rep{rep}: wall {wall:.3f}s jobs={len(jobs)} rows={n}", flush=True)

app_id = spark.sparkContext.applicationId
url = f"http://localhost:4056/api/v1/applications/{app_id}/jobs?status=succeeded"
alljobs = json.load(urllib.request.urlopen(url))


def ts(s):
    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")


rows = sorted((j["jobId"], j["submissionTime"], j["completionTime"], j["name"][:90]) for j in alljobs if j["jobId"] in jobs)
t_first = ts(rows[0][1])
for jid, sub, done, desc in rows:
    dur = (ts(done) - ts(sub)).total_seconds()
    start = (ts(sub) - t_first).total_seconds()
    print(f"job {jid:4d} +{start:7.3f}s dur={dur:6.3f}s  {desc}")
spark.stop()
