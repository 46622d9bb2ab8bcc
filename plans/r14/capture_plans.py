"""Capture .explain('formatted') for named catalog queries into
plans/r14/<query>_<tag>.txt. Usage:
    python plans/r14/capture_plans.py before q1 q2 ...
Runs on a small core count so it can coexist with other work; explain is
planning-only (no execution) except for builders that run driver-side
collects while constructing the plan (kmeans fit, PQ codebooks).
"""

import os
import sys

sys.path.insert(0, "/root/repo")

tag = sys.argv[1]
names = sys.argv[2:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from datapipelines_spark.catalog import all_queries  # noqa: E402
from datapipelines_spark.functions.caching import release_persists  # noqa: E402
from datapipelines_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name=f"plans-{tag}")
registry = all_queries()
out_dir = os.path.dirname(os.path.abspath(__file__))

for name in names:
    df = registry[name].builder(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    release_persists()
    spark.catalog.clearCache()
spark.stop()
