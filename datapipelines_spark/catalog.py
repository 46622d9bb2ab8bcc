"""Declared-query catalog: the engine's operator coverage, made executable.

Every operator family from SURVEY.md §2 (plus the LLM-pipeline extensions) is
demonstrated by at least one named query here. Each entry pairs

- a **builder**: ``(spark, sf_dir) -> DataFrame`` written with the engine's
  operators / DataFrame API, and
- an optional **oracle**: an ANSI-ish SQL string DuckDB runs over the same
  parquet tables (views ``region nation customer supplier part orders
  lineitem events documents embeddings``) for differential correctness.

Column names are aliased identically on both sides — the driver sorts columns
by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None -> driver does a rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = "") -> Callable[[Builder], Builder]:
    """Register a named query; used as a decorator over builder functions."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every query module and return the full registry."""
    # Imports are deferred so `import datapipelines_spark` stays cheap.
    from datapipelines_spark.queries import (  # noqa: F401
        relational,
        windows,
        setops,
        scalars,
        dedup,
        similarity,
        textstats,
        events,
        samples,
        advanced,
        sqlapi,
        vectors,
        tpch_extra,
        cleaning,
        breadth,
        streamrep,
        layout,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in PRIORITY_50:
        ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered

# The driver's correctness gate hashes exactly the FIRST 50 entries of
# all_queries() in iteration order. The window ROTATES each round so
# cumulative driver-green coverage grows instead of re-verifying the same 50
# (VERDICT r2 #6). Round-5 window, following the r4 rotation plan and
# VERDICT r4 items 1+4:
#   (a) CORRECTNESS_r04 was 50/50 green -- no reds to pin;
#   (b) the 2 queries pending a first verdict lead the window
#       (multimodal_mp4_probe, jsonl_gz_roundtrip -- with these, every one of
#       the 140 catalog queries has at least one driver verdict);
#   (c) multimodal_jpeg_decode re-pins because the JPEG codec changed this
#       round (ADVICE r4 restart-interval / fill-byte / multi-scan fixes);
#   (d) all 43 r2-only verdicts re-confirm so no query's latest verdict is
#       more than two rounds stale;
#   (e) the 4 remaining slots take the oldest r3-only verdicts.
# Everything stays covered locally by tests/test_oracle_differential.py
# (every catalog query, replicating the driver compare, sf0.01 via
# SPARK_GRAFT_ORACLE_DIR).
PRIORITY_50: tuple[str, ...] = (
    # --- first driver verdicts (pending from r4) ---
    "multimodal_mp4_probe",
    "jsonl_gz_roundtrip",
    # --- changed this round: JPEG codec ADVICE fixes ---
    "multimodal_jpeg_decode",
    # --- the 43 r2-only verdicts, re-confirmed under current code ---
    "agg_approx_distinct_parts",
    "asof_join_last_order_before_event",
    "batch_fixed_size_groups",
    "decontaminate_ngram_overlap",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "epoch_repeat_cycle",
    "filter_required_keys",
    "filter_size_range",
    "having_big_part_groups",
    "join_anti_customers_without_orders",
    "join_metadata_rename_collision",
    "join_null_safe_segments",
    "join_outer_order_counts",
    "join_semi_customers_with_orders",
    "mapper_rescale_embeddings",
    "mix_weighted_sources",
    "multimodal_binary_stats",
    "pack_sequences_budget",
    "percentile_order_values",
    "pivot_status_by_priority",
    "q12_priority_shipping_split",
    "q18_large_volume_customers",
    "q21_suppliers_kept_orders_waiting",
    "q3_shipping_priority",
    "q9_profit_by_nation_year",
    "range_join_price_bands",
    "rollup_order_totals",
    "scalar_array_funcs",
    "scalar_json_extract",
    "setop_union_customer_supplier_nations",
    "shuffle_deterministic_rank",
    "sim_ivf_topk_probe2",
    "sim_lsh_candidate_pairs",
    "sql_grouping_sets_mixed",
    "sql_lateral_top2_orders",
    "stream_dedup_exact_replay",
    "subquery_above_avg_orders",
    "text_tfidf_top_terms",
    "unpivot_lineitem_measures",
    "window_range_frame_30d_spend",
    "window_topk_parts_per_supplier",
    # --- oldest r3-only verdicts (4 remaining slots) ---
    "q2_min_cost_supplier",
    "q8_market_share",
    "dedup_embedding_cosine",
    "stream_tumbling_1h_replay",
)


#: Queries added AFTER the current PRIORITY_50 was pinned: they have no
#: driver verdict yet and MUST lead the next round's window. Keep in sync
#: when adding catalog queries mid-round (test_catalog_order enforces that
#: every query is either driver-verified, in the window, or listed here).
PENDING_FIRST_VERDICT: tuple[str, ...] = (
    "csv_roundtrip",  # added r5 after the window was pinned
    "orc_roundtrip",
    "quality_nb_classifier",
    "text_bm25_search",
    "multimodal_gif_decode",
    "graph_pagerank_trade",
    "xml_roundtrip",
)

# r6 rotation plan (build the next PRIORITY_50 from this, in order):
#   1. any query red or errored in CORRECTNESS_r05 (fix first, then pin);
#   2. PENDING_FIRST_VERDICT above (first driver verdicts), if any;
#   3. queries whose plans/outputs change in r6;
#   4. the r3-only verdicts not re-confirmed in r5 -- everything in
#      CORRECTNESS_r03.json minus CORRECTNESS_r04.json minus the 4 oldest
#      re-confirmed above (40 queries);
#   5. oldest r4 verdicts with remaining slots.
