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
WINDOW_ROUND = 13

# Round-13 window:
#   (a) CORRECTNESS_r12 was 50/50 green — no red block;
#   (b) first driver verdict: url_psl_snapshot_domains (added after the
#       r12 window was pinned; queued all round as PENDING_FIRST_VERDICT
#       — VERDICT r12 next #1 says it must lead this window);
#   (c) r13 behavior/plan changes re-confirmed:
#       - stream_ingest_dedup_replay: the ingest state became append-only
#         (manifest-committed MOR deltas, VERDICT r12 next #2) — output
#         pinned byte-identical, commit protocol rebuilt;
#       - sim_recall_harness: the IVF sweep gained the probes=8
#         exhaustive arm (VERDICT r12 next #3) — one new output row;
#       - url_parse_documents + domain_quota_sample_docs: IDN/punycode
#         host normalization with planted unicode/punycode spellings
#         (VERDICT r12 next #5) — outputs change with the new host mix;
#       - corpus_ingest_pipeline: plan changed by parse_urls's
#         normalization step (output byte-identical — its URL fixture is
#         pinned to the ASCII V1 mix);
#   (d) the rest is the computed staleness queue verbatim over r1..r12:
#       exactly the 44 r8-cohort names (the full cohort drains, so the
#       post-r13 staleness floor moves to r9 as VERDICT r12 projected).
# Everything stays covered locally by tests/test_oracle_differential.py
# (every catalog query, replicating the driver compare, sf0.01 via
# SPARK_GRAFT_ORACLE_DIR).
FIRST_VERDICTS_R13: tuple[str, ...] = (
    "url_psl_snapshot_domains",  # pending from late r12
)

CHANGED_R13: tuple[str, ...] = (
    "stream_ingest_dedup_replay",
    "sim_recall_harness",
    "url_parse_documents",
    "domain_quota_sample_docs",
    "corpus_ingest_pipeline",
)

PRIORITY_50: tuple[str, ...] = FIRST_VERDICTS_R13 + CHANGED_R13 + (
    # --- computed staleness queue (rotation.reconfirm_queue() prefix) ---
    "dedup_clusters",
    "dedup_minhash_lsh",
    "dedup_repeated_ngram_spans",
    "dedup_semantic_clusters",
    "diag_join_key_skew",
    "events_anomaly_mad",
    "events_cohort_retention",
    "events_daily_trend_slope",
    "events_transition_matrix",
    "fluent_pipeline_customers",
    "histogram_equidepth_price",
    "incremental_revenue_by_month",
    "interval_open_orders_sweep",
    "layout_zorder_orders",
    "multimodal_dhash_neardup",
    "profile_observed_orders",
    "q1_pricing_summary",
    "quality_gopher_rules",
    "quality_percent_rank_norm",
    "quality_source_length_drift",
    "quality_token_budget_sample",
    "quality_winsorize_outliers",
    "sample_oversample_parity",
    "scalar_conditional_funcs",
    "scalar_date_funcs",
    "scalar_fuzzy_string",
    "scalar_math_funcs",
    "setop_except_nations",
    "setop_intersect_nations",
    "sim_hard_negatives",
    "sim_lsh_bucket_histogram",
    "sim_pq_rerank_topk",
    "stream_topk_types_replay",
    "text_bpe_tokenize",
    "text_fingerprint",
    "text_gini_diversity",
    "text_language_id",
    "text_length_histogram",
    "text_pmi_collocations",
    "text_quality_score",
    "text_token_stats",
    "window_moving_avg_events",
    "window_order_gaps",
    "window_price_rank_in_brand",
)


#: Queries added AFTER the current PRIORITY_50 was pinned: they have no
#: driver verdict yet and MUST lead the next round's window. Keep in sync
#: when adding catalog queries mid-round (test_catalog_order enforces that
#: every query is either driver-verified, in the window, or listed here).
PENDING_FIRST_VERDICT: tuple[str, ...] = (
    "stream_ingest_asof_replay",  # added after the r13 window was pinned
)

# r14 rotation plan (build the next PRIORITY_50 from this, in order):
#   1. any query red or errored in CORRECTNESS_r13 (fix first, then pin);
#   2. PENDING_FIRST_VERDICT above (first driver verdicts), if any;
#   3. queries whose plans/outputs change in r14;
#   4. rotation.reconfirm_queue(before_round=14) verbatim for every
#      remaining slot — after r13 lands, the queue starts with the r9
#      cohort (head: agg_approx_distinct_parts,
#      asof_join_last_order_before_event, ...).
