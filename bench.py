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

    # DuckDB baseline: median-of-3 of each query's oracle SQL over the same
    # parquet. Ratios >2x of the DuckDB total fail the run (BASELINE.md bar).
    duck_per_query: dict[str, float] = {}
    ratios: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_DUCKDB", "1") != "0":
        from datapipelines_spark.testing import duckdb_connection

        con = duckdb_connection(sf_dir)
        try:
            for name in names:
                oracle = registry[name].oracle
                if oracle is None:
                    continue
                times = []
                for _ in range(repeats):
                    t0 = time.perf_counter()
                    con.execute(oracle).fetchall()
                    times.append(time.perf_counter() - t0)
                duck_per_query[name] = round(sorted(times)[len(times) // 2], 3)
                r = per_query[name] / max(duck_per_query[name], 1e-9)
                ratios[name] = round(r, 2)
                print(
                    f"# {name}: spark {per_query[name]:.3f}s vs duckdb "
                    f"{duck_per_query[name]:.3f}s = {r:.2f}x",
                    file=sys.stderr,
                )
        finally:
            con.close()

    duck_total = round(sum(duck_per_query.values()), 3)
    spark_on_oracled = round(sum(per_query[n] for n in duck_per_query), 3)
    total_ratio = (
        round(spark_on_oracled / duck_total, 3) if duck_total else None
    )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if duck_per_query:
        out["duckdb_queries"] = duck_per_query
        out["duckdb_total"] = duck_total
        out["ratio_vs_duckdb"] = total_ratio
        out["query_ratios"] = ratios
    print(json.dumps(out))
    spark.stop()

    if total_ratio is not None and total_ratio > 2.0:
        print(
            f"# FAIL: spark total {spark_on_oracled}s is {total_ratio}x the "
            f"DuckDB baseline {duck_total}s (bar: 2x)",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
