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
# (VERDICT r2 #6). Round-8 window, following the r7 rotation plan
# (catalog.py r7:195-209) and VERDICT r7 item 1:
#   (a) CORRECTNESS_r07 was 50/50 green -- no reds to pin;
#   (b) the 32 queries added in r7 after that window was pinned lead -- all
#       first driver verdicts. Four of them also pin r8 behavior changes:
#       stream_incremental_view_replay (crash-safe state swap, VERDICT r7
#       #1), quality_winsorize_outliers (integral-type validation, ADVICE),
#       sample_oversample_parity (integer-division factor, ADVICE),
#       dedup_repeated_ngram_spans (null-text filter, ADVICE);
#   (c) 18 of the 19 r4-only stale verdicts fill the rest, in r4 pool
#       order; corpus_clean_pipeline (last in pool order) defers to r9 and
#       leads the r9 staleness pool. After r8, cumulative driver coverage
#       is the entire pre-r8 catalog (202/202).
# Everything stays covered locally by tests/test_oracle_differential.py
# (every catalog query, replicating the driver compare, sf0.01 via
# SPARK_GRAFT_ORACLE_DIR).
PRIORITY_50: tuple[str, ...] = (
    # --- first driver verdicts (added r7 after the r7 window was pinned) ---
    "chunk_fixed_overlap",
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
    # --- 18 r4-only stale verdicts, re-confirmed under current code ---
    "scalar_conditional_funcs",
    "scalar_date_funcs",
    "scalar_fuzzy_string",
    "scalar_math_funcs",
    "setop_except_nations",
    "setop_intersect_nations",
    "sim_lsh_bucket_histogram",
    "text_fingerprint",
    "text_language_id",
    "text_length_histogram",
    "text_quality_score",
    "text_token_stats",
    "window_moving_avg_events",
    "window_order_gaps",
    "window_price_rank_in_brand",
    "q1_pricing_summary",
    "dedup_minhash_lsh",
    "dedup_clusters",
)


#: Queries added AFTER the current PRIORITY_50 was pinned: they have no
#: driver verdict yet and MUST lead the next round's window. Keep in sync
#: when adding catalog queries mid-round (test_catalog_order enforces that
#: every query is either driver-verified, in the window, or listed here).
PENDING_FIRST_VERDICT: tuple[str, ...] = (
    "multimodal_dhash_near_pairs",  # added r8 after the window was pinned
    "multimodal_audio_fp_pairs",
    "multimodal_image_dedup_pipeline",
)

# r9 rotation plan (build the next PRIORITY_50 from this, in order):
#   1. any query red or errored in CORRECTNESS_r08 (fix first, then pin);
#   2. PENDING_FIRST_VERDICT above (first driver verdicts), if any;
#   3. queries whose plans/outputs change in r9;
#   4. corpus_clean_pipeline -- the one r4-only verdict deferred from the
#      r8 window (after it, no r4-only verdict remains anywhere);
#   5. oldest r5 verdicts (CORRECTNESS_r05 minus r06/r07/r08), then oldest
#      r6, with remaining slots -- drains toward the "no verdict older
#      than two rounds of code change" invariant (VERDICT r7 item 2).
