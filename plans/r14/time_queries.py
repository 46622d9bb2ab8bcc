"""Quick per-query timing: median of N repeats of builder().count(), same
protocol as bench.py (cache hygiene between queries, warm-up of q1 first).
Usage: python plans/r14/time_queries.py name1 name2 ...
Env: SPARK_GRAFT_SF_DIR (default sf0.1), REPEATS (default 3).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

names = sys.argv[1:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
repeats = int(os.environ.get("REPEATS", "3"))

from datapipelines_spark.catalog import all_queries  # noqa: E402
from datapipelines_spark.functions.caching import release_persists  # noqa: E402
from datapipelines_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="time-queries")
registry = all_queries()
registry["q1_pricing_summary"].builder(spark, sf_dir).count()  # warm-up

for name in names:
    release_persists()
    spark.catalog.clearCache()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        n = registry[name].builder(spark, sf_dir).count()
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"{name}: {med:.3f}s median of {repeats} (rows={n}) all={[round(t,3) for t in times]}")
release_persists()
spark.catalog.clearCache()
spark.stop()
