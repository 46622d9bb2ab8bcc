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
# (VERDICT r2 #6): round 4 pins (a) the four r3-red queries, now fixed
# (array outputs stringified/exploded, float SUM decimal-cast), (b) queries
# whose plans changed this round, (c) the 7 queries never driver-checked in
# r1-r3, (d) every query ADDED this round (first verdicts beat re-confirms:
# cumulative coverage reaches the full catalog in r4), (e) all 21 r1-only
# verdicts re-confirmed under current code, then (f) the oldest r2-only
# verdicts (4 of 47; the rest rotate in r5).
# Everything stays covered locally by tests/test_oracle_differential.py
# (every catalog query, replicating the driver compare, sf0.01 via
# SPARK_GRAFT_ORACLE_DIR). Queries ADDED in r4 after the window was pinned
# live in PENDING_FIRST_VERDICT below — pin them first in the r5 window.
PRIORITY_50: tuple[str, ...] = (
    # --- pins: red in r3, fixed this round (must re-verify) ---
    "null_semantics",              # r3 hash-red -> decimal-cast SUM
    "map_type_status_counts",      # r3 err -> statuses array_join'd
    "mapper_einops_reduce_groups", # r3 err -> exploded to scalar rows
    "kmeans_centroids_2iter",      # r3 err -> centroid exploded to rows
    # --- pins: changed this round ---
    "sim_topk_bruteforce",         # changed: small-corpus broadcast route
    "sim_ivf_cell_assign",         # changed: max_by argmin, lean broadcast side
    # --- first driver verdicts: the 7 never-checked from r1-r3 ---
    "fuzzy_join_supplier_names",
    "sample_n_per_lang",
    "scalar_from_json_typed",
    "scalar_map_hof_funcs",
    "agg_approx_percentile_contract",
    "sql_recursive_region_chain",
    "sql_exists_correlated",
    # --- first driver verdicts: queries ADDED this round ---
    "mapper_square_crop",
    "pii_redact_documents",
    "text_repetition_signals",
    "multimodal_jpeg_decode",
    "multimodal_wav_decode",
    "multimodal_mjpeg_frames",
    "tar_roundtrip_shards",
    "partition_pruned_scan",
    "bucketed_join_revenue_by_status",
    "stream_static_join_replay",
    "config_pipeline_quality_filter",
    "multimodal_quarantine_decode",
    "multimodal_png_decode",
    # --- r1-only verdicts, re-confirmed under current code ---
    "agg_distinct_suppliers_per_flag",
    "cube_lineitem_flags",
    "dedup_exact_normalized",
    "events_sliding_1h_30m",
    "events_tumbling_1h",
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
    # --- oldest r2-only verdicts, re-confirmed (4 of 47; rest rotate r5) ---
    "q1_pricing_summary",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "corpus_clean_pipeline",
)


#: Queries added AFTER the current PRIORITY_50 was pinned: they have no
#: driver verdict yet and MUST lead the next round's window. Keep in sync
#: when adding catalog queries mid-round (test_catalog_order enforces that
#: every query is either driver-verified, in the window, or listed here).
PENDING_FIRST_VERDICT: tuple[str, ...] = (
    "multimodal_mp4_probe",  # added after the r4 window absorbed the rest
    "jsonl_gz_roundtrip",
)

# r5 rotation plan (build the next PRIORITY_50 from this, in order):
#   1. any query red or errored in CORRECTNESS_r04 (fix first, then pin);
#   2. PENDING_FIRST_VERDICT above (first driver verdicts);
#   3. queries whose plans/outputs change in r5;
#   4. the r2-only verdicts not re-confirmed in r4 — the remaining 43:
#      everything in CORRECTNESS_r02.json except q1_pricing_summary,
#      dedup_minhash_lsh, dedup_clusters, corpus_clean_pipeline (done r4)
#      and stream_tumbling/dedup_embedding_cosine/sim_topk (re-done r3/r4);
#   5. oldest r3 verdicts with remaining slots.
