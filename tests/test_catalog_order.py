"""The driver's correctness gate checks exactly the first 50 entries of
``all_queries()`` in iteration order; PRIORITY_50 pins those slots."""

import json
import os

from datapipelines_spark.catalog import (
    PENDING_FIRST_VERDICT,
    PRIORITY_50,
    all_queries,
)


def _verdicts(*rounds: str) -> set[str]:
    seen: set[str] = set()
    for fname in rounds:
        path = os.path.join(os.path.dirname(__file__), "..", fname)
        if os.path.exists(path):
            with open(path) as f:
                seen |= set(json.load(f))
    return seen


def test_priority_window_is_exactly_50_unique_names():
    assert len(PRIORITY_50) == 50
    assert len(set(PRIORITY_50)) == 50


def test_priority_window_leads_registry_order():
    names = list(all_queries())
    assert names[:50] == list(PRIORITY_50)


def test_priority_window_pins_first_verdicts_and_changed_queries_first():
    # Round-7 rotation policy (VERDICT r6 #1): the 18 queries added in r6
    # after that window was pinned lead (all first driver verdicts), then
    # the two r3-only verdicts deferred from the r6 window.
    assert list(PRIORITY_50[:18]) == [
        "quality_lm_perplexity",
        "dedup_winnow_fingerprints",
        "text_heavy_hitter_tokens",
        "stream_minhash_bands_replay",
        "sample_weighted_topk",
        "upsert_orders_snapshot",
        "quality_constraint_checks",
        "graph_triangle_interactions",
        "sim_pq_adc_topk",
        "dedup_clusters_longest_survivor",
        "split_leakage_safe_eval",
        "text_build_vocab",
        "multimodal_adpcm_decode",
        "multimodal_flac_decode",
        "multimodal_avi_frames",
        "profile_orders_table",
        "multimodal_y4m_frames",
        "mix_temperature_sources",
    ]
    assert list(PRIORITY_50[18:20]) == [
        "window_first_last_value",
        "window_running_customer_spend",
    ]


def test_priority_window_refreshes_oldest_stale_verdicts():
    """Staleness invariant (VERDICT r6 #3): after r7 no verdict may be
    older than r4, and the r4-only staleness pool drains oldest-first —
    every window slot not taken by a first verdict or deferral holds an
    r4-only query."""
    r3 = _verdicts("CORRECTNESS_r03.json")
    r4 = _verdicts("CORRECTNESS_r04.json")
    if not r4:  # fresh checkout without round artifacts
        return
    later = _verdicts("CORRECTNESS_r05.json", "CORRECTNESS_r06.json")
    # the 2 deferred r3-only verdicts are pinned (slots 18-19 above);
    # everything else in slots 20+ must come from the r4-only pool
    r4_only = r4 - later
    not_stale = [n for n in PRIORITY_50[20:] if n not in r4_only]
    assert not not_stale, f"non-r4-stale queries occupying staleness slots: {not_stale}"
    assert not (r3 - r4 - later - set(PRIORITY_50))  # no r3-only left behind


def test_priority_window_completes_cumulative_driver_coverage():
    """Rounds 1-6 verdicts + the r7 window must cover the ENTIRE catalog
    except queries explicitly declared PENDING_FIRST_VERDICT."""
    seen = _verdicts(
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
        "CORRECTNESS_r05.json",
        "CORRECTNESS_r06.json",
    )
    if not seen:  # fresh checkout without round artifacts
        return
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
