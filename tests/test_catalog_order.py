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
    # Round-6 rotation policy (VERDICT r5 #1): the seven queries that were
    # pending a first verdict after r5 lead the window, then the five
    # queries added in r6 (driver gates for the previously pytest-only
    # operators + the TIFF codec).
    assert list(PRIORITY_50[:7]) == [
        "csv_roundtrip",
        "orc_roundtrip",
        "xml_roundtrip",
        "quality_nb_classifier",
        "text_bm25_search",
        "multimodal_gif_decode",
        "graph_pagerank_trade",
    ]
    assert list(PRIORITY_50[7:12]) == [
        "decontaminate_bloom",
        "chunk_cdc_dedup",
        "quality_compression_signal",
        "multimodal_spectral_features",
        "multimodal_tiff_decode",
    ]


#: r3-only verdicts knowingly deferred to the r7 window (the r6 window had
#: 38 slots for 40 of them); the r7 rotation plan in catalog.py names them.
DEFERRED_TO_NEXT_ROUND = {
    "window_first_last_value",
    "window_running_customer_spend",
}


def test_priority_window_refreshes_all_stale_r3_verdicts():
    """Staleness invariant (VERDICT r5 #6): every r3-only verdict (not
    re-confirmed in r4/r5) must be in the r6 window, except the two
    documented deferrals."""
    r3 = _verdicts("CORRECTNESS_r03.json")
    if not r3:  # fresh checkout without round artifacts
        return
    later = _verdicts("CORRECTNESS_r04.json", "CORRECTNESS_r05.json")
    stale = sorted(r3 - later - DEFERRED_TO_NEXT_ROUND)
    missing = [n for n in stale if n not in PRIORITY_50]
    assert not missing, f"stale r3-only verdicts not in the r6 window: {missing}"


def test_priority_window_completes_cumulative_driver_coverage():
    """Rounds 1-5 verdicts + the r6 window must cover the ENTIRE catalog
    except queries explicitly declared PENDING_FIRST_VERDICT."""
    seen = _verdicts(
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
        "CORRECTNESS_r05.json",
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
