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
# all_queries() in iteration order. This list pins those 50 slots to one
# representative per operator family (SURVEY.md §2 + the LLM-pipeline and
# streaming extensions) so every family gets a driver verdict; the remaining
# catalog keeps registration order after them and stays covered by the local
# differential suite (tests/test_oracle_differential.py, all 100+ queries).
PRIORITY_50: tuple[str, ...] = (
    # TPC-H core + representative extras
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_profit_by_nation_year",
    "q12_priority_shipping_split",
    "q18_large_volume_customers",
    "q21_suppliers_kept_orders_waiting",
    # joins (semi/anti/outer, metadata-join rename, as-of, range, null-safe)
    "join_semi_customers_with_orders",
    "join_anti_customers_without_orders",
    "join_outer_order_counts",
    "join_metadata_rename_collision",
    "asof_join_last_order_before_event",
    "range_join_price_bands",
    "join_null_safe_segments",
    # aggregation shapes
    "agg_approx_distinct_parts",
    "rollup_order_totals",
    "having_big_part_groups",
    "subquery_above_avg_orders",
    # windows + reshape
    "window_topk_parts_per_supplier",
    "window_range_frame_30d_spend",
    "pivot_status_by_priority",
    "unpivot_lineitem_measures",
    "percentile_order_values",
    # set ops / mixing / epochs / batching (D1-D7, B1)
    "setop_union_customer_supplier_nations",
    "mix_weighted_sources",
    "shuffle_deterministic_rank",
    "epoch_repeat_cycle",
    "batch_fixed_size_groups",
    # filters / mappers / multimodal (F3-F4, M3, M4 metadata path)
    "filter_required_keys",
    "filter_size_range",
    "mapper_rescale_embeddings",
    "multimodal_binary_stats",
    # scalar function families + SQL entry points
    "scalar_json_extract",
    "scalar_array_funcs",
    "sql_lateral_top2_orders",
    "sql_grouping_sets_mixed",
    # dedup family (exact, n-gram, MinHash+LSH, SimHash, embedding, clusters)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_clusters",
    # corpus pipeline (cleaning, decontamination, packing)
    "corpus_clean_pipeline",
    "decontaminate_ngram_overlap",
    "pack_sequences_budget",
    # similarity / ANN
    "sim_topk_bruteforce",
    "sim_lsh_candidate_pairs",
    "sim_ivf_topk_probe2",
    # text analysis
    "text_tfidf_top_terms",
    # streaming (bounded replay, real watermarked streams)
    "stream_tumbling_1h_replay",
    "stream_dedup_exact_replay",
)
