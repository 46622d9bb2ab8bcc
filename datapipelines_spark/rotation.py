"""Verdict-staleness accounting for the driver's 50-query correctness window.

The driver hashes exactly the first 50 entries of ``all_queries()`` each
round and records per-query verdicts in ``CORRECTNESS_r{N}.json``. The
window must ROTATE so cumulative driver-green coverage grows and no verdict
goes stale — and the staleness queue must be COMPUTED from those artifacts,
not hand-maintained: a hand-kept "r4-only" list let ``scalar_string_funcs``
sit on a round-1 verdict for seven rounds (VERDICT r8 "What's wrong" #2).

``reconfirm_queue`` is the canonical ordering: every query that has at
least one fully-green driver verdict, sorted stalest-first by its LATEST
green round, ties broken by name. ``tests/test_catalog_order.py`` asserts
the re-confirmation slots of ``catalog.PRIORITY_50`` are exactly a prefix
of this queue, so no query can escape the rotation again.
"""

from __future__ import annotations

import glob
import json
import os
import re

#: Repo root — the round artifacts live next to the package.
_DEFAULT_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _is_green(verdict: dict) -> bool:
    """A verdict counts only if fully green: rows + schema + (when the
    query has an oracle) value hash, with no error. ``hash_match`` may be
    absent/None for rows-only checks."""
    return bool(
        verdict.get("rows_match")
        and verdict.get("schema_match")
        and verdict.get("hash_match") is not False
        and not verdict.get("err")
    )


def latest_verdict_rounds(
    artifact_dir: str = _DEFAULT_DIR, before_round: int | None = None
) -> dict[str, int]:
    """name -> highest round with a fully-green driver verdict, parsed from
    every ``CORRECTNESS_r*.json`` under ``artifact_dir``. Queries that only
    ever appeared red/errored are absent (they have no green verdict).

    ``before_round`` bounds the artifacts considered to rounds strictly
    below it — pass ``catalog.WINDOW_ROUND`` so the accounting a window
    was pinned FROM stays stable when the window's own round lands its
    artifact (ADVICE r9: the unbounded read made the round-N invariants
    false the moment CORRECTNESS_rN.json appeared)."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(artifact_dir, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if before_round is not None and rnd >= before_round:
            continue
        with open(path) as f:
            verdicts = json.load(f)
        for name, verdict in verdicts.items():
            if _is_green(verdict):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def reconfirm_queue(
    artifact_dir: str = _DEFAULT_DIR, before_round: int | None = None
) -> list[str]:
    """Every driver-verified query, stalest latest-green-verdict first
    (ties by name): the canonical order for the window's re-confirmation
    slots. Queries with no verdict yet are NOT here — they belong to the
    first-verdict block at the head of the window. ``before_round`` as in
    ``latest_verdict_rounds``."""
    latest = latest_verdict_rounds(artifact_dir, before_round)
    return sorted(latest, key=lambda n: (latest[n], n))
