"""The driver's correctness gate checks exactly the first 50 entries of
``all_queries()`` in iteration order; PRIORITY_50 pins those slots."""

from datapipelines_spark.catalog import PRIORITY_50, all_queries


def test_priority_window_is_exactly_50_unique_names():
    assert len(PRIORITY_50) == 50
    assert len(set(PRIORITY_50)) == 50


def test_priority_window_leads_registry_order():
    names = list(all_queries())
    assert names[:50] == list(PRIORITY_50)


def test_priority_window_pins_changed_queries_first():
    # Round-4 rotation policy (VERDICT r3 #4): the leading slots are the four
    # r3-red queries (now fixed) plus queries new/changed this round — they
    # MUST get a fresh driver verdict; the rest grows cumulative coverage.
    fixed_reds = {
        "null_semantics",
        "map_type_status_counts",
        "mapper_einops_reduce_groups",
        "kmeans_centroids_2iter",
    }
    assert fixed_reds <= set(PRIORITY_50[:4])
    assert "sim_topk_bruteforce" in PRIORITY_50[:6]
    assert "sim_ivf_cell_assign" in PRIORITY_50[:6]
    # every query added in r4 gets its first verdict THIS round
    for name in (
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
    ):
        assert name in PRIORITY_50, name


def test_priority_window_completes_cumulative_driver_coverage():
    """Round-4 window + rounds 1-3 verdicts must cover the ENTIRE catalog
    except queries added after the window was pinned and the (rows-only)
    streaming replays outside it — i.e. the 7 never-checked queries all get
    their first verdict this round (VERDICT r3 #4)."""
    import json
    import os

    seen = set()
    for fname in (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
    ):
        path = os.path.join(os.path.dirname(__file__), "..", fname)
        if os.path.exists(path):
            with open(path) as f:
                seen |= set(json.load(f))
    if not seen:  # fresh checkout without round artifacts
        return
    for name in (
        "fuzzy_join_supplier_names",
        "sample_n_per_lang",
        "scalar_from_json_typed",
        "scalar_map_hof_funcs",
        "agg_approx_percentile_contract",
        "sql_recursive_region_chain",
        "sql_exists_correlated",
    ):
        assert name not in seen and name in PRIORITY_50, name
    from datapipelines_spark.catalog import PENDING_FIRST_VERDICT

    uncovered = [
        n
        for n in all_queries()
        if n not in seen and n not in PRIORITY_50 and n not in PENDING_FIRST_VERDICT
    ]
    assert not uncovered, (
        "queries with no verdict ever, not in the window, and not declared "
        f"PENDING_FIRST_VERDICT: {uncovered}"
    )
    stale = [n for n in PENDING_FIRST_VERDICT if n in seen or n in PRIORITY_50]
    assert not stale, f"PENDING_FIRST_VERDICT entries already covered: {stale}"


def test_every_priority_query_has_an_oracle():
    qs = all_queries()
    missing = [n for n in PRIORITY_50 if qs[n].oracle is None]
    assert not missing, f"priority queries without oracle SQL: {missing}"
