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
# (VERDICT r2 #6). Round-6 window, following the r5 rotation plan
# (catalog.py r5:169-176) and VERDICT r5 items 1+2+6:
#   (a) CORRECTNESS_r05 was 50/50 green -- no reds to pin;
#   (b) the 7 queries pending a first verdict lead the window (with these,
#       every pre-r6 catalog query has at least one driver verdict);
#   (c) the 5 queries ADDED in r6 (driver-gating the four previously
#       pytest-only operators -- CDC chunking, Bloom decontamination,
#       compression-ratio signal, spectral features -- plus the TIFF codec
#       stretch) pin their first verdicts; multimodal_gif_decode in (b) also
#       re-pins the r6 GIF disposal/GCE fixes, text_bm25_search the top-k
#       rewrite, graph_pagerank_trade the broadcast size gate;
#   (d) 38 of the 40 r3-only verdicts not re-confirmed in r5 fill the rest
#       (CORRECTNESS_r03 minus r04 minus r05 minus the 4 re-confirmed in
#       r5); the final 2 (window_first_last_value,
#       window_running_customer_spend) defer to r7 -- see the r7 plan.
# Everything stays covered locally by tests/test_oracle_differential.py
# (every catalog query, replicating the driver compare, sf0.01 via
# SPARK_GRAFT_ORACLE_DIR).
PRIORITY_50: tuple[str, ...] = (
    # --- first driver verdicts (pending from r5) ---
    "csv_roundtrip",
    "orc_roundtrip",
    "xml_roundtrip",
    "quality_nb_classifier",
    "text_bm25_search",
    "multimodal_gif_decode",
    "graph_pagerank_trade",
    # --- new in r6: driver gates for the r5 pytest-only operators + TIFF ---
    "decontaminate_bloom",
    "chunk_cdc_dedup",
    "quality_compression_signal",
    "multimodal_spectral_features",
    "multimodal_tiff_decode",
    # --- r3-only verdicts, re-confirmed under current code (38 of 40) ---
    "calendar_fill_monthly_orders",
    "corr_discount_quantity",
    "events_funnel_conversion",
    "events_interpolate_hourly",
    "events_latest_per_user",
    "events_session_windows",
    "events_user_lifetime_stats",
    "multimodal_ppm_decode",
    "q10_returned_item_revenue",
    "q11_important_part_value",
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q20_high_volume_part_suppliers",
    "q22_inactive_rich_customers",
    "q4_order_priority_waiting",
    "q5_local_supplier_volume",
    "q7_nation_trade_volume",
    "rollup_grouping_id",
    "scalar_string_funcs_extended",
    "sim_ivf_kmeans_topk",
    "skew_salted_quantity_by_flag",
    "sql_q6_forecast_revenue",
    "sql_revenue_by_month",
    "sql_top_customers",
    "stratified_sample_by_lang",
    "stream_session_6h_replay",
    "stream_sliding_1h30m_replay",
    "stream_stateful_user_stats_replay",
    "stream_stream_join_replay",
    "string_agg_nation_names",
    "text_regex_token_classes",
    "union_by_name_missing_columns",
    "vector_label_centroids",
    "vector_position_stats",
)


#: Queries added AFTER the current PRIORITY_50 was pinned: they have no
#: driver verdict yet and MUST lead the next round's window. Keep in sync
#: when adding catalog queries mid-round (test_catalog_order enforces that
#: every query is either driver-verified, in the window, or listed here).
PENDING_FIRST_VERDICT: tuple[str, ...] = (
    "quality_lm_perplexity",  # added r6 after the window was pinned
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
)

# r7 rotation plan (build the next PRIORITY_50 from this, in order):
#   1. any query red or errored in CORRECTNESS_r06 (fix first, then pin);
#   2. PENDING_FIRST_VERDICT above (first driver verdicts), if any;
#   3. queries whose plans/outputs change in r7;
#   4. the 2 r3-only verdicts deferred from the r6 window:
#      window_first_last_value, window_running_customer_spend;
#   5. oldest r4 verdicts (CORRECTNESS_r04 minus r05 minus r06), then
#      oldest r5 verdicts, with remaining slots.
