"""Isolate the quality_linear_classifier regression: time the query with
(A) the collect/local-relation epoch materialization and (B) the
localCheckpoint path (forced via _LOCAL_WEIGHTS_MAX monkeypatch), same
session, bench repeat protocol."""

import sys
import time

sys.path.insert(0, "/root/repo")

import datapipelines_spark.operators.linear as linear  # noqa: E402
from datapipelines_spark.catalog import all_queries  # noqa: E402
from datapipelines_spark.functions.caching import release_persists  # noqa: E402
from datapipelines_spark.session import get_spark  # noqa: E402

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile-linear")
registry = all_queries()
registry["q1_pricing_summary"].builder(spark, sf_dir).count()  # warm-up


def run(tag):
    release_persists()
    spark.catalog.clearCache()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = registry["quality_linear_classifier"].builder(spark, sf_dir).count()
        times.append(round(time.perf_counter() - t0, 3))
    print(f"{tag}: median {sorted(times)[1]:.3f} all={times} rows={n}", flush=True)


run("A collect-path (current)")
linear._LOCAL_WEIGHTS_MAX = 0
run("B checkpoint-path + lab persist")
run("B repeat")
linear._LOCAL_WEIGHTS_MAX = 65_536
run("A repeat")
spark.stop()
