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
        urls,
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
# (VERDICT r2 #6). Since r9 the re-confirmation slots are COMPUTED, not
# hand-maintained: rotation.py derives every query's latest green driver
# verdict from the CORRECTNESS_r*.json artifacts, and the window's tail
# must be a prefix of rotation.reconfirm_queue() (stalest latest-verdict
# first, ties by name) — tests/test_catalog_order.py enforces it. That
# closes the VERDICT r8 accounting escape where a hand-kept "r4-only" list
# let scalar_string_funcs sit on its round-1 verdict for seven rounds.

#: The round whose window PRIORITY_50 pins. The rotation accounting is
#: computed from artifacts of rounds STRICTLY BELOW this (ADVICE r9: an
#: unbounded artifact read made the round's own invariants false the
#: moment the driver wrote CORRECTNESS_r{WINDOW_ROUND}.json — the window
#: constants must stay valid before AND after the round lands).
WINDOW_ROUND = 10

# Round-10 window:
#   (a) CORRECTNESS_r09 had ONE red — quality_linear_classifier (hash
#       mismatch from exp()/round(double) oracle non-portability; replay
#       surface rebuilt on integer micro-units + the rational sigmoid in
#       r10, so it re-enters as a never-green first verdict and leads);
#   (b) first driver verdicts: the 3 r9 additions that missed the r9
#       window (kNN components, incremental distinct, 3-D Hilbert) and
#       the 8 new r10 queries (cleaning pipeline v2 with the substring
#       cut, streaming distinct under retractions, the layout advisor,
#       URL parse + domain blocklist, per-domain quota sampling,
#       incremental MIN/MAX under retractions, C4 line cleaning,
#       normalized exact dedup);
#   (c) r10 behavior/plan changes re-confirmed: sim_knn_graph (gemm path
#       rewritten: block-pair sub-blocking + eps-extended shortlist) and
#       dedup_substring_removal (the rebuild now semi-join-probes covered
#       docs and passes the clean majority through verbatim);
#   (d) the rest is the computed staleness queue verbatim over r1..r9:
#       the 15 r5-cohort leftovers, then the r6 cohort in name order.
# Everything stays covered locally by tests/test_oracle_differential.py
# (every catalog query, replicating the driver compare, sf0.01 via
# SPARK_GRAFT_ORACLE_DIR).
FIRST_VERDICTS_R10: tuple[str, ...] = (
    "quality_linear_classifier",  # r9 red, rebuilt — never green yet
    "sim_knn_components",  # added r9 after the r9 window was pinned
    "incremental_distinct_customers",
    "layout_hilbert3_orders",
    "corpus_clean_pipeline_v2",  # added r10
    "stream_incremental_distinct_replay",
    "layout_advisor_orders",
    "url_parse_documents",
    "domain_quota_sample_docs",
    "incremental_minmax_order_price",
    "c4_line_clean_documents",
    "dedup_normalized_exact",
)

CHANGED_R10: tuple[str, ...] = (
    "sim_knn_graph",
    "dedup_substring_removal",
)

PRIORITY_50: tuple[str, ...] = FIRST_VERDICTS_R10 + CHANGED_R10 + (
    # --- computed staleness queue (rotation.reconfirm_queue() prefix) ---
    "scalar_array_funcs",
    "scalar_json_extract",
    "setop_union_customer_supplier_nations",
    "shuffle_deterministic_rank",
    "sim_ivf_topk_probe2",
    "sim_lsh_candidate_pairs",
    "sql_grouping_sets_mixed",
    "sql_lateral_top2_orders",
    "stream_dedup_exact_replay",
    "stream_tumbling_1h_replay",
    "subquery_above_avg_orders",
    "text_tfidf_top_terms",
    "unpivot_lineitem_measures",
    "window_range_frame_30d_spend",
    "window_topk_parts_per_supplier",
    "calendar_fill_monthly_orders",
    "chunk_cdc_dedup",
    "corr_discount_quantity",
    "csv_roundtrip",
    "decontaminate_bloom",
    "events_funnel_conversion",
    "events_interpolate_hourly",
    "events_latest_per_user",
    "events_session_windows",
    "events_user_lifetime_stats",
    "graph_pagerank_trade",
    "multimodal_gif_decode",
    "multimodal_ppm_decode",
    "multimodal_spectral_features",
    "multimodal_tiff_decode",
    "orc_roundtrip",
    "q10_returned_item_revenue",
    "q11_important_part_value",
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
)


#: Queries added AFTER the current PRIORITY_50 was pinned: they have no
#: driver verdict yet and MUST lead the next round's window. Keep in sync
#: when adding catalog queries mid-round (test_catalog_order enforces that
#: every query is either driver-verified, in the window, or listed here).
PENDING_FIRST_VERDICT: tuple[str, ...] = (
    "stream_incremental_minmax_replay",
    "agg_theta_sketch_distinct",
    "sim_sq8_rerank_topk",
    "dedup_incremental_batch",
    "layout_hilbert4_orders",
    "sim_ivf_sq8_topk",
    "multimodal_qoi_decode",
)

# r11 rotation plan (build the next PRIORITY_50 from this, in order):
#   1. any query red or errored in CORRECTNESS_r10 (fix first, then pin);
#   2. PENDING_FIRST_VERDICT above (first driver verdicts), if any;
#   3. queries whose plans/outputs change in r11;
#   4. rotation.reconfirm_queue(before_round=11) verbatim for every
#      remaining slot — after r10 lands, the queue starts with the ~23
#      r6-cohort names that did not fit this window, then the r7 cohort.
#
# r11 candidate (plan-only change, values identical): port the 2-D/3-D
# Hilbert FSTs to the hex-string-table lookup the 4-D path uses —
# lit(list)/array(*lits) cost one py4j call per element at plan-build time
# (the 4-D fix measured 4.3 s -> 0.85 s; the 192-entry 3-D tables lose
# ~0.3 s the same way). If done, layout_hilbert_orders /
# layout_hilbert3_orders / layout_advisor_orders enter block 3.
