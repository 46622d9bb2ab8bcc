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
    # Round-5 rotation policy (VERDICT r4 #1): the two queries that were
    # pending a first verdict after r4 lead the window, then the query whose
    # code changed this round (JPEG codec ADVICE fixes).
    assert PRIORITY_50[0] == "multimodal_mp4_probe"
    assert PRIORITY_50[1] == "jsonl_gz_roundtrip"
    assert "multimodal_jpeg_decode" in PRIORITY_50[:3]


def test_priority_window_refreshes_all_stale_r2_verdicts():
    """VERDICT r4 #4: every r2-only verdict (not re-confirmed in r3/r4)
    must be in the r5 window so no query's latest verdict is more than two
    rounds stale."""
    r2 = _verdicts("CORRECTNESS_r02.json")
    if not r2:  # fresh checkout without round artifacts
        return
    later = _verdicts("CORRECTNESS_r03.json", "CORRECTNESS_r04.json")
    stale = sorted(r2 - later)
    missing = [n for n in stale if n not in PRIORITY_50]
    assert not missing, f"stale r2-only verdicts not in the r5 window: {missing}"


def test_priority_window_completes_cumulative_driver_coverage():
    """Rounds 1-4 verdicts + the r5 window must cover the ENTIRE catalog
    except queries explicitly declared PENDING_FIRST_VERDICT."""
    seen = _verdicts(
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
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
