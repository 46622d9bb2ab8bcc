"""Distributed Lloyd's k-means: correctness vs a numpy reference, early
stop, determinism, and guard rails."""

import numpy as np
import pytest

from datapipelines_spark.operators.clustering import (
    _assign_batch,
    kmeans_assign,
    kmeans_fit,
)


def _numpy_lloyd(V, k, iters):
    C = V[np.argsort(np.arange(len(V)))][:k].copy()  # rows already id-ordered
    for _ in range(iters):
        a = _assign_batch(V, C)
        for c in range(k):
            m = a == c
            if m.any():
                C[c] = V[m].mean(axis=0)
    return C


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(3)
    V = rng.normal(size=(200, 8)).astype(np.float64)
    # plant 4 separated blobs so convergence is quick and unambiguous
    V[:50] += 8
    V[50:100] -= 8
    V[100:150, 0] += 20
    rows = [(int(i), [float(x) for x in V[i]]) for i in range(len(V))]
    return spark.createDataFrame(rows, "vec_id long, v array<double>"), V


def test_kmeans_matches_numpy_reference(vec_df):
    df, V = vec_df
    cents, iters = kmeans_fit(df, "v", "vec_id", k=4, max_iter=3, tol=0.0)
    assert iters == 3
    ref = _numpy_lloyd(V, 4, 3)
    assert np.allclose(cents, ref, atol=1e-9)


def test_kmeans_early_stop_on_convergence(vec_df):
    df, _ = vec_df
    cents, iters = kmeans_fit(df, "v", "vec_id", k=4, max_iter=50, tol=1e-9)
    assert iters < 50  # separated blobs converge in a few rounds
    # converged fixpoint: one more iteration doesn't move the centroids
    again, _ = kmeans_fit(df, "v", "vec_id", k=4, max_iter=iters + 1, tol=1e-9)
    assert np.allclose(cents, again, atol=1e-9)


def test_kmeans_assign_covers_every_row_deterministically(vec_df):
    df, V = vec_df
    cents, _ = kmeans_fit(df, "v", "vec_id", k=4, max_iter=2, tol=0.0)
    a1 = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, "v", "vec_id", cents).collect()}
    a2 = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, "v", "vec_id", cents).collect()}
    assert a1 == a2
    assert len(a1) == len(V)
    ref = _assign_batch(V, cents)
    assert all(a1[i] == ref[i] for i in range(len(V)))


def test_kmeans_requires_k_rows(spark):
    tiny = spark.createDataFrame([(1, [0.0, 0.0])], "vec_id long, v array<double>")
    with pytest.raises(ValueError, match="need at least k"):
        kmeans_fit(tiny, "v", "vec_id", k=4)


def test_kmeans_input_narrower_than_partition_count(spark):
    """Regression: empty partitions in the partials stage used to emit an
    empty frame whose float64 "s" column Arrow cannot convert to
    list<double> — any input with fewer rows than partitions crashed."""
    import numpy as np

    from datapipelines_spark.operators.clustering import kmeans_fit

    rng = np.random.default_rng(0)
    rows = [(i, [float(x) for x in rng.normal(size=4)]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, iters = kmeans_fit(
        df.repartition(16), "embedding", "vec_id", k=2, max_iter=2, tol=0.0
    )
    assert cents.shape == (2, 4) and iters == 2
