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
        ingest,
        recall,
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
WINDOW_ROUND = 11

# Round-11 window:
#   (a) CORRECTNESS_r10 was 50/50 green — no red block;
#   (b) first driver verdicts: the 7 late-r10 additions that missed the
#       r10 window (theta KMV sketch, incremental-batch dedup verdicts,
#       4-D Hilbert, QOI decode, IVF+SQ8 and flat-SQ8 ANN, streaming
#       min/max under retractions) plus the 2 new r11 queries — the
#       composed URL-governance + incremental-dedup ingest pipeline
#       (queries/ingest.py) and the ANN recall@5 harness across the four
#       quantization families (queries/recall.py);
#   (c) r11 behavior/plan changes re-confirmed: the URL pair (registrable
#       domain now runs against the vendored PSL 2-label slice and the
#       planted fixture gained a gob.mx host) and the Hilbert trio
#       (2-D/3-D FSTs ported to the hex-string-table lookup — values
#       pinned identical by tests/test_hilbert.py, plans rebuilt);
#   (d) the rest is the computed staleness queue verbatim over r1..r10:
#       the 29 r6-cohort names, then the r7 cohort in name order.
# Everything stays covered locally by tests/test_oracle_differential.py
# (every catalog query, replicating the driver compare, sf0.01 via
# SPARK_GRAFT_ORACLE_DIR).
FIRST_VERDICTS_R11: tuple[str, ...] = (
    "agg_theta_sketch_distinct",
    "dedup_incremental_batch",
    "layout_hilbert4_orders",
    "multimodal_qoi_decode",
    "sim_ivf_sq8_topk",
    "sim_sq8_rerank_topk",
    "stream_incremental_minmax_replay",
    "corpus_ingest_pipeline",  # new r11
    "sim_recall_harness",  # new r11
)

CHANGED_R11: tuple[str, ...] = (
    "url_parse_documents",
    "domain_quota_sample_docs",
    "layout_hilbert_orders",
    "layout_hilbert3_orders",
    "layout_advisor_orders",
)

PRIORITY_50: tuple[str, ...] = FIRST_VERDICTS_R11 + CHANGED_R11 + (
    # --- computed staleness queue (rotation.reconfirm_queue() prefix) ---
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q20_high_volume_part_suppliers",
    "q22_inactive_rich_customers",
    "q4_order_priority_waiting",
    "q5_local_supplier_volume",
    "q7_nation_trade_volume",
    "quality_compression_signal",
    "quality_nb_classifier",
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
    "text_bm25_search",
    "text_regex_token_classes",
    "union_by_name_missing_columns",
    "vector_label_centroids",
    "vector_position_stats",
    "xml_roundtrip",
    "agg_approx_percentile_contract",
    "agg_distinct_suppliers_per_flag",
    "bucketed_join_revenue_by_status",
    "config_pipeline_quality_filter",
    "cube_lineitem_flags",
    "dedup_clusters_longest_survivor",
    "dedup_exact_normalized",
)


#: Queries added AFTER the current PRIORITY_50 was pinned: they have no
#: driver verdict yet and MUST lead the next round's window. Keep in sync
#: when adding catalog queries mid-round (test_catalog_order enforces that
#: every query is either driver-verified, in the window, or listed here).
PENDING_FIRST_VERDICT: tuple[str, ...] = (
    "dedup_recall_harness",  # added after the r11 window was pinned
)

# r12 rotation plan (build the next PRIORITY_50 from this, in order):
#   1. any query red or errored in CORRECTNESS_r11 (fix first, then pin);
#   2. PENDING_FIRST_VERDICT above (first driver verdicts), if any;
#   3. queries whose plans/outputs change in r12;
#   4. rotation.reconfirm_queue(before_round=12) verbatim for every
#      remaining slot — after r11 lands, the queue starts with the r7
#      cohort names that did not fit this window.
