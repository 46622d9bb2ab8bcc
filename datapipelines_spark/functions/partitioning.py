"""Partitioning helpers: restore parallelism ahead of CPU-heavy row-local work.

A selective filter, a small dimension table, or (as in the local fixtures) a
single-row-group parquet file leaves a DataFrame with fewer partitions than
the cluster has cores; any expensive per-row expression downstream (shingle
construction, vector math, Python stages) then runs on a fraction of the
machine. ``parallelize_small`` widens *only when needed* — at 100 TB a scan
already yields thousands of splits and this is a no-op check, costing one
metadata lookup and no shuffle.

This is the relational stand-in for the reference's worker fan-out
(D4/D5, /root/reference/sdata/datapipeline.py:446-470): there, parallelism
came from processes; here it's an explicit exchange only when the plan lacks
width.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame


def plan_fingerprint(df: DataFrame) -> str:
    """sha256 of ``df``'s CANONICALIZED analyzed plan — a collision-safe
    cache key, unlike ``DataFrame.semanticHash()`` whose 32 bits let distinct
    plans collide and return each other's memoized values.

    Canonicalization normalizes expression IDs (``doc_id#123L`` →
    ``none#0L``), so two independent rebuilds of the same query fingerprint
    identically — the raw analyzed string embeds freshly-allocated exprIds
    and would never hit the cache for its stated purpose (bench repeats,
    retried pipelines). The schema JSON is mixed in as a discriminator
    because ``treeString`` elides columns past
    ``spark.sql.debug.maxToStringFields`` (default 25): without it, two
    distinct wide plans could share a fingerprint and return each other's
    memoized width."""
    qe = df._jdf.queryExecution()
    plan = qe.analyzed().canonicalized().toString()
    return hashlib.sha256(
        plan.encode() + b"\x00" + df.schema.json().encode()
    ).hexdigest()


#: (applicationId, analyzed-plan sha256) -> probed partition width. The width
#: of a deterministic plan over immutable inputs cannot change within a
#: session, so repeated builds of the same query (bench repeats, retried
#: pipelines) skip the physical-planning pass the ``.rdd`` probe forces — the
#: session-scoped analogue of a catalog's table-statistics cache. Caveat: for
#: mutable/appended sources the width CAN drift within a session; the cached
#: value then only mis-sizes the widen-if-narrow check below (perf, never
#: correctness).
_WIDTH_CACHE: dict[tuple[str, str], int] = {}


def plan_width(df: DataFrame) -> int:
    """Partition count of ``df``'s physical plan, memoized per session."""
    key = (df.sparkSession.sparkContext.applicationId, plan_fingerprint(df))
    width = _WIDTH_CACHE.get(key)
    if width is None:
        if len(_WIDTH_CACHE) > 4096:
            _WIDTH_CACHE.clear()
        width = df.rdd.getNumPartitions()
        _WIDTH_CACHE[key] = width
    return width


def parallelize_small(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the input is narrower than the session's
    default parallelism (or ``min_partitions``) — a FLOOR, never a coalesce.

    Call sites are narrow sources (a single fixture parquet, a collected
    dimension) that would otherwise run downstream CPU-bound stages on 1-2
    input splits. The width probe (``df.rdd.getNumPartitions()``) does force
    physical planning of the upstream plan once per builder invocation —
    a measurable but bounded cost — and is kept deliberately: the
    alternative (unconditional ``repartition(target)``) would silently
    COALESCE an already-wide input down to ``target``, destroying
    parallelism exactly when the data is big — a scan of 100 TB yields
    ~800k splits from ``spark.sql.files.maxPartitionBytes`` and must never
    be squeezed to ``defaultParallelism``. Correct-at-scale beats saving
    one planning pass.
    """
    if df.isStreaming:
        # a streaming plan has no .rdd to probe and its micro-batch
        # parallelism is the source's to decide; the widen-if-narrow check
        # is a batch concern
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if plan_width(df) >= target:
        return df
    return df.repartition(target)
