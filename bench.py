"""Benchmark harness: run headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed as a full action (count of the materialized result)
after one warm-up of the flagship to amortize JVM/session startup, which the
metric excludes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_topk_parts_per_supplier",
    "window_running_customer_spend",
    "agg_distinct_suppliers_per_flag",
    "rollup_order_totals",
    "join_outer_order_counts",
    "mix_weighted_sources",
    "scalar_math_funcs",
    "events_tumbling_1h",
    "events_session_windows",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "text_token_stats",
    "text_quality_score",
    "sim_topk_bruteforce",
    "sim_lsh_candidate_pairs",
    "sim_ivf_cell_assign",
    "asof_join_last_order_before_event",
    "sql_q6_forecast_revenue",
    "percentile_order_values",
    # training-pipeline showcase: snowflake profit, sole-late-supplier,
    # near-dup clustering, composed cleaning, TF-IDF, decontamination,
    # sequence packing
    "q9_profit_by_nation_year",
    "q21_suppliers_kept_orders_waiting",
    "dedup_clusters",
    "corpus_clean_pipeline",
    "text_tfidf_top_terms",
    "decontaminate_ngram_overlap",
    "pack_sequences_budget",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datapipelines_spark.session import get_spark
    from datapipelines_spark.catalog import all_queries

    spark = get_spark(app_name="bench")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]

    # Warm-up: JVM, parquet footer caches, Python worker pool.
    registry["q1_pricing_summary"].builder(spark, sf_dir).count()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    per_query: dict[str, float] = {}
    for name in names:
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            n = registry[name].builder(spark, sf_dir).count()
            times.append(time.perf_counter() - t0)
        per_query[name] = round(sorted(times)[len(times) // 2], 3)
        print(f"# {name}: {per_query[name]:.3f}s median of {repeats} ({n} rows)", file=sys.stderr)

    total = round(sum(per_query.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
