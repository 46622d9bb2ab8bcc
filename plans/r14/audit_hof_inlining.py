"""Audit: scan every headline query's OPTIMIZED plan for the O(D²)
HOF-inlining trap — an `aggregate(` fold nested INSIDE a lambdafunction
body (higher-order functions are interpreted, so a fold re-evaluated per
element is a quadratic per-row cost). Prints any query whose plan
contains the pattern, with the offending fragment."""

import re
import sys

sys.path.insert(0, "/root/repo")

from datapipelines_spark.catalog import all_queries  # noqa: E402
from datapipelines_spark.functions.caching import release_persists  # noqa: E402
from datapipelines_spark.session import get_spark  # noqa: E402
from bench import HEADLINE  # noqa: E402

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="audit-hof-inlining")
registry = all_queries()


def lambda_bodies(plan: str):
    """Yield the argument text of each lambdafunction( occurrence,
    balanced-paren scan."""
    for m in re.finditer(r"lambdafunction\(", plan):
        depth = 1
        i = m.end()
        while i < len(plan) and depth:
            if plan[i] == "(":
                depth += 1
            elif plan[i] == ")":
                depth -= 1
            i += 1
        yield plan[m.end(): i - 1]


hits = 0
for name in HEADLINE:
    try:
        df = registry[name].builder(spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().treeString()
    except Exception as e:  # noqa: BLE001
        print(f"{name}: BUILD ERROR {e}", flush=True)
        continue
    finally:
        release_persists()
        spark.catalog.clearCache()
    bad = [b for b in lambda_bodies(plan) if "aggregate(" in b]
    if bad:
        hits += 1
        print(f"{name}: {len(bad)} lambda bodies contain a fold", flush=True)
        print("   e.g.:", bad[0][:220], flush=True)

print(f"done: {hits} queries with fold-inside-lambda", flush=True)
spark.stop()
