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
# (VERDICT r2 #6). Since r9 the re-confirmation slots are COMPUTED, not
# hand-maintained: rotation.py derives every query's latest green driver
# verdict from the CORRECTNESS_r*.json artifacts, and the window's tail
# must be a prefix of rotation.reconfirm_queue() (stalest latest-verdict
# first, ties by name) — tests/test_catalog_order.py enforces it. That
# closes the VERDICT r8 accounting escape where a hand-kept "r4-only" list
# let scalar_string_funcs sit on its round-1 verdict for seven rounds.
#
# Round-9 window:
#   (a) CORRECTNESS_r08 was 50/50 green — no reds to pin;
#   (b) first driver verdicts: the 3 queries added in r8 after that window
#       was pinned, then the 6 added in r9 (variable-length substring
#       dedup spans + the applied removal, linear quality classifier, MOR
#       schema evolution + vacuum, mutual kNN graph, Hilbert layout);
#   (c) r9 behavior/plan changes re-confirmed: stream_incremental_view_
#       replay (IVM sink gained the metrics sidecar + epoch-0 recovery
#       fix), and the three MOR-read queries (reads now go through
#       _read_raw with mergeSchema + explicit version lists);
#   (d) the rest is the computed staleness queue verbatim:
#       scalar_string_funcs (r1!), corpus_clean_pipeline (r4), then the r5
#       cohort in name order — 35 fit, the remaining 15 r5 names lead r10.
# Everything stays covered locally by tests/test_oracle_differential.py
# (every catalog query, replicating the driver compare, sf0.01 via
# SPARK_GRAFT_ORACLE_DIR).
FIRST_VERDICTS_R9: tuple[str, ...] = (
    "multimodal_dhash_near_pairs",  # added r8 after the r8 window was pinned
    "multimodal_audio_fp_pairs",
    "multimodal_image_dedup_pipeline",
    "dedup_substring_spans",  # added r9
    "dedup_substring_removal",
    "quality_linear_classifier",
    "upsert_schema_evolution",
    "sim_knn_graph",
    "layout_hilbert_orders",
)

CHANGED_R9: tuple[str, ...] = (
    "stream_incremental_view_replay",
    "diff_orders_versions",
    "scd2_orders_history",
    "upsert_orders_snapshot",
)

PRIORITY_50: tuple[str, ...] = FIRST_VERDICTS_R9 + CHANGED_R9 + (
    # --- computed staleness queue (rotation.reconfirm_queue() prefix) ---
    "scalar_string_funcs",
    "corpus_clean_pipeline",
    "agg_approx_distinct_parts",
    "asof_join_last_order_before_event",
    "batch_fixed_size_groups",
    "decontaminate_ngram_overlap",
    "dedup_embedding_cosine",
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
    "jsonl_gz_roundtrip",
    "mapper_rescale_embeddings",
    "mix_weighted_sources",
    "multimodal_binary_stats",
    "multimodal_jpeg_decode",
    "multimodal_mp4_probe",
    "pack_sequences_budget",
    "percentile_order_values",
    "pivot_status_by_priority",
    "q12_priority_shipping_split",
    "q18_large_volume_customers",
    "q21_suppliers_kept_orders_waiting",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "range_join_price_bands",
    "rollup_order_totals",
)


#: Queries added AFTER the current PRIORITY_50 was pinned: they have no
#: driver verdict yet and MUST lead the next round's window. Keep in sync
#: when adding catalog queries mid-round (test_catalog_order enforces that
#: every query is either driver-verified, in the window, or listed here).
PENDING_FIRST_VERDICT: tuple[str, ...] = (
    "sim_knn_components",  # added r9 after the r9 window was pinned
    "incremental_distinct_customers",
    "layout_hilbert3_orders",
)

# r10 rotation plan (build the next PRIORITY_50 from this, in order):
#   1. any query red or errored in CORRECTNESS_r09 (fix first, then pin);
#   2. PENDING_FIRST_VERDICT above (first driver verdicts), if any;
#   3. queries whose plans/outputs change in r10;
#   4. rotation.reconfirm_queue() computed over CORRECTNESS_r01..r09,
#      verbatim, for every remaining slot — after r9 lands, the queue
#      starts with the 15 r5 names that did not fit this window, then the
#      r6 cohort.
