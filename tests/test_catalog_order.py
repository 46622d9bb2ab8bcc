"""The driver's correctness gate checks exactly the first 50 entries of
``all_queries()`` in iteration order; PRIORITY_50 pins those slots.

Since r9 the re-confirmation tail is asserted against the COMPUTED
staleness queue (rotation.py over the CORRECTNESS_r*.json artifacts) —
the VERDICT r8 fix for the hand-maintained rotation lists that let
scalar_string_funcs sit on a round-1 verdict for seven rounds. No query
can escape the rotation again without failing these tests."""

from datapipelines_spark.catalog import (
    CHANGED_R9,
    FIRST_VERDICTS_R9,
    PENDING_FIRST_VERDICT,
    PRIORITY_50,
    all_queries,
)
from datapipelines_spark.rotation import latest_verdict_rounds, reconfirm_queue


def test_priority_window_is_exactly_50_unique_names():
    assert len(PRIORITY_50) == 50
    assert len(set(PRIORITY_50)) == 50


def test_priority_window_leads_registry_order():
    names = list(all_queries())
    assert names[:50] == list(PRIORITY_50)


def test_first_verdict_block_is_exactly_the_never_verified_queries():
    """Block (b): every window query with NO driver verdict in any
    CORRECTNESS artifact must be declared in FIRST_VERDICTS_R9, and vice
    versa — first verdicts lead the window."""
    latest = latest_verdict_rounds()
    if not latest:  # fresh checkout without round artifacts
        return
    never = {n for n in all_queries() if n not in latest}
    assert never == set(FIRST_VERDICTS_R9) | set(PENDING_FIRST_VERDICT), (
        "queries without any verdict must be FIRST_VERDICTS_R9 or "
        f"PENDING_FIRST_VERDICT; mismatch: {never ^ set(FIRST_VERDICTS_R9)}"
    )
    n_fv = len(FIRST_VERDICTS_R9)
    assert list(PRIORITY_50[:n_fv]) == list(FIRST_VERDICTS_R9)


def test_reconfirm_tail_is_a_prefix_of_the_computed_staleness_queue():
    """Block (d) — THE computed-queue property: after the first-verdict
    and changed-query blocks, the window is exactly a prefix of
    rotation.reconfirm_queue() (stalest latest verdict first, ties by
    name). A hand-edit that skips a stale query breaks this assertion."""
    queue = [n for n in reconfirm_queue() if n not in CHANGED_R9]
    if not queue:  # fresh checkout without round artifacts
        return
    head = len(FIRST_VERDICTS_R9) + len(CHANGED_R9)
    tail = list(PRIORITY_50[head:])
    assert tail == queue[: len(tail)]


def test_changed_queries_have_prior_verdicts():
    """Block (c): the changed-query block re-confirms behavior changes —
    each entry must already have a driver verdict (else it belongs in the
    first-verdict block)."""
    latest = latest_verdict_rounds()
    if not latest:
        return
    missing = [n for n in CHANGED_R9 if n not in latest]
    assert not missing, f"CHANGED_R9 entries with no prior verdict: {missing}"


def test_staleness_invariant_after_this_window_lands():
    """Assuming the r9 window goes green, no query's latest verdict is
    older than round 5, and the oldest survivors are exactly the computed
    queue's next prefix — the drain the rotation exists for."""
    latest = latest_verdict_rounds()
    if not latest:
        return
    projected = {**latest, **{n: 9 for n in PRIORITY_50}}
    floor = min(projected[n] for n in all_queries() if n in projected)
    assert floor >= 5, f"stale verdict would survive r9: floor={floor}"


def test_every_priority_query_has_an_oracle():
    qs = all_queries()
    missing = [n for n in PRIORITY_50 if qs[n].oracle is None]
    assert not missing, f"priority queries without oracle SQL: {missing}"
