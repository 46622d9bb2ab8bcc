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
# (VERDICT r2 #6): round 3 pins (a) queries changed or red last round, then
# (b) every query that has never had a driver verdict, then (c) re-confirms
# of r1-only verdicts. Rounds 1-2 driver-verified the per-family
# representatives (see CORRECTNESS_r0{1,2}.json); everything stays covered
# locally by tests/test_oracle_differential.py (all 111 queries, replicating
# the driver compare at sf0.01 via SPARK_GRAFT_ORACLE_DIR).
PRIORITY_50: tuple[str, ...] = (
    # --- pins: changed or previously-red this round (must re-verify) ---
    "stream_tumbling_1h_replay",   # r2 red (timestamp collapse) -> fixed
    "dedup_embedding_cosine",      # rerouted to blocked-GEMM default
    "multimodal_ppm_decode",       # new: REAL codec decode (M4)
    # --- first driver verdicts: TPC-H remainder ---
    "q2_min_cost_supplier",
    "q4_order_priority_waiting",
    "q7_nation_trade_volume",
    "q8_market_share",
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
    # --- first driver verdicts: events / windows / calendar ---
    "events_user_lifetime_stats",
    "events_funnel_conversion",
    "events_interpolate_hourly",
    "events_latest_per_user",
    "window_first_last_value",
    "calendar_fill_monthly_orders",
    # --- first driver verdicts: SQL entry, aggregates, semantics ---
    "sql_q6_forecast_revenue",
    "sql_top_customers",
    "sql_revenue_by_month",
    "rollup_grouping_id",
    "corr_discount_quantity",
    "string_agg_nation_names",
    "null_semantics",
    "union_by_name_missing_columns",
    "map_type_status_counts",
    "skew_salted_quantity_by_flag",
    # --- first driver verdicts: vectors / text / mappers ---
    "vector_label_centroids",
    "vector_position_stats",
    "sim_ivf_cell_assign",
    "text_regex_token_classes",
    "scalar_string_funcs_extended",
    "mapper_einops_reduce_groups",
    # --- first driver verdicts: new streaming replays (this round) ---
    "stream_session_6h_replay",
    "stream_sliding_1h30m_replay",
    "stream_stream_join_replay",
    "stream_stateful_user_stats_replay",
    # --- first driver verdicts: trained clustering + changed BLAS top-k ---
    "kmeans_centroids_2iter",
    "sim_ivf_kmeans_topk",
    "sim_topk_bruteforce",
    "stratified_sample_by_lang",
    # --- r1-only verdicts, re-confirmed under current code ---
    "q5_local_supplier_volume",
    "events_session_windows",
    "window_running_customer_spend",
)
