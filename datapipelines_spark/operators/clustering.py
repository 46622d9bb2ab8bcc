"""Distributed k-means (Lloyd's algorithm) over embedding columns.

Trains the coarse quantizer an IVF index needs (queries/vectors.py currently
picks fixed vectors as cells; ``kmeans_fit`` learns them instead), and is the
generic "partition a corpus by semantic neighborhood" primitive a training-
data pipeline uses for curriculum bucketing / stratified sampling.

Scale shape (what survives 100 TB):
- Centroids are tiny (k × dim doubles) and live on the driver between
  iterations, broadcast into tasks each round — the classic Lloyd layout.
- Each iteration is ONE mapInPandas pass: every Arrow batch computes its
  argmin assignments with a numpy matmul and emits k partial
  (cluster, count, sum-vector) rows, so the per-iteration shuffle is
  O(partitions × k), never O(corpus). The corpus itself is never shuffled.
- The input projection is persisted once (bounded registry) so iterations
  re-read a cached two-column table, not the full source.

Determinism: init is the k lowest-id vectors (no RNG), argmin ties break to
the lowest cluster index, and all arithmetic is float64 — so a fixed
iteration count is reproducible across engines, which is what lets DuckDB
oracle the driver query (queries/vectors.py:kmeans_centroids_2iter).

Reference parity: the reference has no clustering (it is an iterator
library); this extends the LLM-pipeline surface per SURVEY §2.10.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from datapipelines_spark.functions.caching import managed_persist

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("cluster", T.IntegerType()),
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
    ]
)


def _assign_batch(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Argmin squared-euclidean assignment, ties to the lowest cluster.

    Distances use the direct ``(v - c)^2`` form (not the expanded
    ``|v|^2 - 2vc + |c|^2``) to stay numerically close to a naive
    re-computation — argmin then agrees with any engine's sequential
    arithmetic except on exact ties, which the low-index rule settles.
    """
    # (n, k): broadcasting difference per centroid — k is small by contract
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)  # np.argmin returns the FIRST minimal index


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-6,
    init_centroids: np.ndarray | None = None,
) -> tuple[np.ndarray, int]:
    """Lloyd's k-means; returns ``(centroids (k, dim) float64, iterations_run)``.

    Stops early when the max centroid shift (L2) drops below ``tol``;
    ``tol=0`` forces exactly ``max_iter`` iterations (the reproducible mode
    the oracle-checked query uses). Empty clusters keep their previous
    centroid (no re-seeding — deterministic). ``init_centroids`` resumes
    from a previous fit's output (so "centroids after N and after N+M
    iterations" costs N+M iterations total, not 2N+M); default init is the
    k lowest-id vectors.
    """
    from datapipelines_spark.functions.partitioning import parallelize_small

    base = managed_persist(
        parallelize_small(
            df.select(F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("v"))
        )
    )
    if init_centroids is not None:
        cents = np.asarray(init_centroids, dtype=np.float64).copy()
        if len(cents) != k:
            raise ValueError(f"init_centroids has {len(cents)} rows, expected k={k}")
    else:
        seed_rows = base.orderBy("__id").limit(k).collect()
        if len(seed_rows) < k:
            raise ValueError(
                f"kmeans_fit: need at least k={k} vectors, got {len(seed_rows)}"
            )
        cents = np.array([list(r["v"]) for r in seed_rows], dtype=np.float64)
    spark = df.sparkSession
    iters = 0
    for _ in range(max_iter):
        bc = spark.sparkContext.broadcast(cents)

        def partials(batches, _bc=bc):
            c = _bc.value
            kk, dim = c.shape
            counts = np.zeros(kk, dtype=np.int64)
            sums = np.zeros((kk, dim), dtype=np.float64)
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(list(pdf["v"]), dtype=np.float64)
                a = _assign_batch(mat, c)
                np.add.at(counts, a, 1)
                np.add.at(sums, a, mat)
            live = np.nonzero(counts)[0]
            if not len(live):
                # empty partition: yield NOTHING — an empty frame's "s"
                # column carries float64 dtype, which Arrow cannot convert
                # to list<double> (crashed kmeans_fit whenever the input
                # was narrower than the partition count)
                return
            yield pd.DataFrame(
                {"cluster": live.astype("int32"), "n": counts[live], "s": list(sums[live])}
            )

        parts = base.mapInPandas(partials, _PARTIAL_SCHEMA).collect()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(cents)
        for r in parts:
            counts[r["cluster"]] += r["n"]
            sums[r["cluster"]] += np.asarray(r["s"], dtype=np.float64)
        new_cents = cents.copy()
        live = counts > 0
        new_cents[live] = sums[live] / counts[live, None]
        shift = float(np.sqrt(((new_cents - cents) ** 2).sum(axis=1)).max())
        cents = new_cents
        iters += 1
        if tol > 0 and shift < tol:
            break
    return cents, iters


def kmeans_assign(
    df: DataFrame, vec_col: str, id_col: str, centroids: np.ndarray
) -> DataFrame:
    """(id, cluster) assignment of every row to trained centroids — one
    broadcast + one Arrow pass, no shuffle."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))
    schema = T.StructType(
        [T.StructField("__id", T.LongType()), T.StructField("cluster", T.IntegerType())]
    )

    def assign(batches):
        c = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf["v"]), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"].to_numpy(dtype=np.int64),
                    "cluster": _assign_batch(mat, c).astype("int32"),
                }
            )

    proj = df.select(F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("v"))
    return proj.mapInPandas(assign, schema).withColumnRenamed("__id", id_col)
