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
WINDOW_ROUND = 12

# Round-12 window:
#   (a) CORRECTNESS_r11 was 50/50 green — no red block;
#   (b) first driver verdicts: dedup_recall_harness (added late-r11 as
#       PENDING_FIRST_VERDICT; this round it also gained the
#       choose_banding tuned arms and the per-doc graded-variant tails)
#       plus the 2 new r12 queries — the one-call OPTIMIZE verb composed
#       end-to-end (layout_optimize_orders) and the streaming ingest loop
#       with the crash-safe index+verdicts swap
#       (stream_ingest_dedup_replay);
#   (c) r12 behavior/plan changes re-confirmed: sim_recall_harness (the
#       single ivf arm became the probes 1/2/4 sweep) and
#       sim_ivf_topk_probe2 (body extracted into the parameterized
#       ivf_topk_probe — output pinned byte-identical, plan rebuilt);
#   (d) the rest is the computed staleness queue verbatim over r1..r11:
#       the 42 r7-cohort names, then the r8 cohort head in name order.
# Everything stays covered locally by tests/test_oracle_differential.py
# (every catalog query, replicating the driver compare, sf0.01 via
# SPARK_GRAFT_ORACLE_DIR).
FIRST_VERDICTS_R12: tuple[str, ...] = (
    "dedup_recall_harness",  # pending from late r11
    "layout_optimize_orders",  # new r12
    "stream_ingest_dedup_replay",  # new r12
)

CHANGED_R12: tuple[str, ...] = (
    "sim_recall_harness",
    "sim_ivf_topk_probe2",
)

PRIORITY_50: tuple[str, ...] = FIRST_VERDICTS_R12 + CHANGED_R12 + (
    # --- computed staleness queue (rotation.reconfirm_queue() prefix) ---
    "dedup_winnow_fingerprints",
    "events_sliding_1h_30m",
    "events_tumbling_1h",
    "fuzzy_join_supplier_names",
    "graph_triangle_interactions",
    "kmeans_centroids_2iter",
    "map_type_status_counts",
    "mapper_einops_reduce_groups",
    "mapper_square_crop",
    "mix_temperature_sources",
    "multimodal_adpcm_decode",
    "multimodal_avi_frames",
    "multimodal_flac_decode",
    "multimodal_mjpeg_frames",
    "multimodal_png_decode",
    "multimodal_quarantine_decode",
    "multimodal_wav_decode",
    "multimodal_y4m_frames",
    "null_semantics",
    "partition_pruned_scan",
    "pii_redact_documents",
    "profile_orders_table",
    "quality_constraint_checks",
    "quality_lm_perplexity",
    "sample_n_per_lang",
    "sample_weighted_topk",
    "scalar_from_json_typed",
    "scalar_map_hof_funcs",
    "sim_ivf_cell_assign",
    "sim_pq_adc_topk",
    "sim_topk_bruteforce",
    "split_leakage_safe_eval",
    "sql_exists_correlated",
    "sql_recursive_region_chain",
    "stream_minhash_bands_replay",
    "stream_static_join_replay",
    "tar_roundtrip_shards",
    "text_build_vocab",
    "text_heavy_hitter_tokens",
    "text_repetition_signals",
    "window_first_last_value",
    "window_running_customer_spend",
    "chunk_fixed_overlap",
    "customer_rfm_segments",
    "decontaminate_minhash_cross",
)


#: Queries added AFTER the current PRIORITY_50 was pinned: they have no
#: driver verdict yet and MUST lead the next round's window. Keep in sync
#: when adding catalog queries mid-round (test_catalog_order enforces that
#: every query is either driver-verified, in the window, or listed here).
PENDING_FIRST_VERDICT: tuple[str, ...] = (
    "url_psl_snapshot_domains",  # added after the r12 window was pinned
)

# r13 rotation plan (build the next PRIORITY_50 from this, in order):
#   1. any query red or errored in CORRECTNESS_r12 (fix first, then pin);
#   2. PENDING_FIRST_VERDICT above (first driver verdicts), if any;
#   3. queries whose plans/outputs change in r13;
#   4. rotation.reconfirm_queue(before_round=13) verbatim for every
#      remaining slot — after r12 lands, the queue starts with the r8
#      cohort names that did not fit this window.
