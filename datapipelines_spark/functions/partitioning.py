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

from pyspark.sql import DataFrame


def parallelize_small(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition of a KNOWN-SMALL input to the session's
    default parallelism (or ``min_partitions``).

    Call sites are narrow sources (a single fixture parquet, a collected
    dimension) that would otherwise run downstream CPU-bound stages on 1-2
    input splits. The repartition is unconditional: probing
    ``df.rdd.getNumPartitions()`` to skip it would force physical planning
    on every invocation (and sidestep AQE), which costs more than the one
    small round-robin exchange. Do NOT use this on large tables — a scan of
    100 TB already yields wide, well-sized splits from
    ``spark.sql.files.maxPartitionBytes``.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target)
