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
# (VERDICT r2 #6). Round-7 window, following the r6 rotation plan
# (catalog.py r6:183-190) and VERDICT r6 items 1+3:
#   (a) CORRECTNESS_r06 was 50/50 green -- no reds to pin;
#   (b) the 18 queries added in r6 after that window was pinned lead -- all
#       first driver verdicts; graph_triangle_interactions among them also
#       pins the r7 localCheckpoint fix (VERDICT r6 #1), upsert/profile the
#       r7 commit-ordering hardening;
#   (c) the 2 r3-only verdicts deferred from the r6 window
#       (window_first_last_value, window_running_customer_spend) -- after
#       these, no verdict in the catalog is older than r4;
#   (d) the 30 oldest r4-only verdicts (CORRECTNESS_r04 minus r05 minus
#       r06, in r4 order) fill the rest; the remaining 19 r4-only queries
#       go first in the r8 staleness pool.
# Everything stays covered locally by tests/test_oracle_differential.py
# (every catalog query, replicating the driver compare, sf0.01 via
# SPARK_GRAFT_ORACLE_DIR).
PRIORITY_50: tuple[str, ...] = (
    # --- first driver verdicts (added r6 after the r6 window was pinned) ---
    "quality_lm_perplexity",
    "dedup_winnow_fingerprints",
    "text_heavy_hitter_tokens",
    "stream_minhash_bands_replay",
    "sample_weighted_topk",
    "upsert_orders_snapshot",
    "quality_constraint_checks",
    "graph_triangle_interactions",
    "sim_pq_adc_topk",
    "dedup_clusters_longest_survivor",
    "split_leakage_safe_eval",
    "text_build_vocab",
    "multimodal_adpcm_decode",
    "multimodal_flac_decode",
    "multimodal_avi_frames",
    "profile_orders_table",
    "multimodal_y4m_frames",
    "mix_temperature_sources",
    # --- the 2 r3-only verdicts deferred from the r6 window ---
    "window_first_last_value",
    "window_running_customer_spend",
    # --- 30 oldest r4-only verdicts, re-confirmed under current code ---
    "null_semantics",
    "map_type_status_counts",
    "mapper_einops_reduce_groups",
    "kmeans_centroids_2iter",
    "sim_topk_bruteforce",
    "sim_ivf_cell_assign",
    "fuzzy_join_supplier_names",
    "sample_n_per_lang",
    "scalar_from_json_typed",
    "scalar_map_hof_funcs",
    "agg_approx_percentile_contract",
    "sql_recursive_region_chain",
    "sql_exists_correlated",
    "mapper_square_crop",
    "pii_redact_documents",
    "text_repetition_signals",
    "multimodal_wav_decode",
    "multimodal_mjpeg_frames",
    "tar_roundtrip_shards",
    "partition_pruned_scan",
    "bucketed_join_revenue_by_status",
    "stream_static_join_replay",
    "config_pipeline_quality_filter",
    "multimodal_quarantine_decode",
    "multimodal_png_decode",
    "agg_distinct_suppliers_per_flag",
    "cube_lineitem_flags",
    "dedup_exact_normalized",
    "events_sliding_1h_30m",
    "events_tumbling_1h",
)


#: Queries added AFTER the current PRIORITY_50 was pinned: they have no
#: driver verdict yet and MUST lead the next round's window. Keep in sync
#: when adding catalog queries mid-round (test_catalog_order enforces that
#: every query is either driver-verified, in the window, or listed here).
PENDING_FIRST_VERDICT: tuple[str, ...] = (
    "chunk_fixed_overlap",  # added r7 after the window was pinned
    "diff_orders_versions",
    "layout_zorder_orders",
    "incremental_revenue_by_month",
    "sim_pq_rerank_topk",
    "decontaminate_minhash_cross",
    "text_bpe_tokenize",
    "stream_incremental_view_replay",
    "dedup_repeated_ngram_spans",
    "quality_token_budget_sample",
    "dedup_semantic_clusters",
    "quality_winsorize_outliers",
    "stream_topk_types_replay",
    "quality_gopher_rules",
    "multimodal_dhash_neardup",
    "events_cohort_retention",
    "interval_open_orders_sweep",
    "scd2_orders_history",
    "histogram_equidepth_price",
    "sim_hard_negatives",
    "text_pmi_collocations",
    "sample_oversample_parity",
    "diag_join_key_skew",
    "quality_percent_rank_norm",
    "events_anomaly_mad",
    "text_gini_diversity",
    "quality_source_length_drift",
    "events_daily_trend_slope",
    "events_transition_matrix",
    "customer_rfm_segments",
    "fluent_pipeline_customers",
    "profile_observed_orders",
)

# r8 rotation plan (build the next PRIORITY_50 from this, in order):
#   1. any query red or errored in CORRECTNESS_r07 (fix first, then pin);
#   2. PENDING_FIRST_VERDICT above (first driver verdicts), if any;
#   3. queries whose plans/outputs change in r8;
#   4. the 19 r4-only verdicts left out of the r7 window
#      (CORRECTNESS_r04 minus r05/r06 minus the 30 pinned above):
#      scalar_conditional_funcs, scalar_date_funcs, scalar_fuzzy_string,
#      scalar_math_funcs, setop_except_nations, setop_intersect_nations,
#      sim_lsh_bucket_histogram, text_fingerprint, text_language_id,
#      text_length_histogram, text_quality_score, text_token_stats,
#      window_moving_avg_events, window_order_gaps,
#      window_price_rank_in_brand, q1_pricing_summary, dedup_minhash_lsh,
#      dedup_clusters, corpus_clean_pipeline;
#   5. oldest r5 verdicts (CORRECTNESS_r05 minus r06 minus r07), with
#      remaining slots.
