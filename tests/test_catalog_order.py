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
    # Round-3 rotation policy (VERDICT r2 #6): slots 1-3 are the queries that
    # were red or materially changed this round — they MUST get a fresh
    # driver verdict; the rest of the window grows cumulative coverage.
    assert PRIORITY_50[0] == "stream_tumbling_1h_replay"
    assert "dedup_embedding_cosine" in PRIORITY_50[:3]
    assert "multimodal_ppm_decode" in PRIORITY_50[:3]


def test_priority_window_grows_cumulative_driver_coverage():
    """Most of the round-3 window must be queries with no driver verdict in
    rounds 1-2 — rotation, not re-verification."""
    import json
    import os

    seen = set()
    for fname in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        path = os.path.join(os.path.dirname(__file__), "..", fname)
        if os.path.exists(path):
            with open(path) as f:
                seen |= set(json.load(f))
    if not seen:  # fresh checkout without round artifacts
        return
    never_checked = [n for n in PRIORITY_50 if n not in seen]
    assert len(never_checked) >= 30, (
        f"only {len(never_checked)} first-verdict slots; rotate more"
    )


def test_every_priority_query_has_an_oracle():
    qs = all_queries()
    missing = [n for n in PRIORITY_50 if qs[n].oracle is None]
    assert not missing, f"priority queries without oracle SQL: {missing}"
