"""Product quantization (operators/pq.py): numpy-reference parity for the
full train/encode/search pipeline, plus shape/guard behavior."""

import numpy as np
import pytest

from datapipelines_spark.operators.pq import pq_adc_topk, pq_encode, pq_fit


def _vectors(n=60, d=8, seed=3):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, d)).round(3)  # round: clean cross-impl floats


def _df(spark, mat):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(mat)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _ref_fit(mat, m, k, iters):
    n, d = mat.shape
    sub = d // m
    books = []
    for j in range(m):
        x = mat[:, j * sub : (j + 1) * sub]
        c = x[:k].copy()  # lowest-id init
        for _ in range(iters):
            a = (((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)).argmin(1)
            for ci in range(k):
                if (a == ci).any():
                    c[ci] = x[a == ci].mean(axis=0)
        books.append(c)
    return np.stack(books)


def test_fit_matches_numpy_reference(spark):
    mat = _vectors()
    books = pq_fit(_df(spark, mat), "embedding", "vec_id", m=2, k=3, max_iter=2)
    expect = _ref_fit(mat, 2, 3, 2)
    assert np.allclose(books, expect, atol=1e-12)


def test_encode_matches_reference_argmin(spark):
    mat = _vectors()
    books = _ref_fit(mat, 2, 3, 1)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(_df(spark, mat), "embedding", "vec_id", books).collect()
    }
    sub = mat.shape[1] // 2
    for i, v in enumerate(mat):
        for j in range(2):
            x = v[j * sub : (j + 1) * sub]
            expect = (((x[None, :] - books[j]) ** 2).sum(axis=1)).argmin()
            assert got[i][j] == expect


def test_adc_topk_matches_reference(spark):
    mat = _vectors(n=80)
    df = _df(spark, mat)
    books = pq_fit(df, "embedding", "vec_id", m=2, k=4, max_iter=1)
    codes_df = pq_encode(df, "embedding", "vec_id", books)
    queries = df.where("vec_id % 20 = 0")
    got = [
        (r["query_id"], r["rank"], r["vec_id"])
        for r in pq_adc_topk(
            codes_df, books, queries, "embedding", "vec_id", top_k=3
        ).orderBy("query_id", "rank").collect()
    ]
    # numpy reference ADC
    sub = mat.shape[1] // 2
    codes = np.stack(
        [
            (((mat[:, j * sub : (j + 1) * sub][:, None, :] - books[j][None]) ** 2).sum(2)).argmin(1)
            for j in range(2)
        ],
        axis=1,
    )
    expect = []
    for q in range(0, 80, 20):
        t = np.stack(
            [
                (((mat[q, j * sub : (j + 1) * sub][None, :] - books[j]) ** 2).sum(1))
                for j in range(2)
            ]
        )
        d = t[0][codes[:, 0]] + t[1][codes[:, 1]]
        order = sorted(range(80), key=lambda i: (d[i], i))[:3]
        expect += [(q, r + 1, i) for r, i in enumerate(order)]
    assert got == expect


def test_pq_guards(spark):
    mat = _vectors(n=10, d=6)
    df = _df(spark, mat)
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(df, "embedding", "vec_id", m=4, k=2)
    books = pq_fit(df, "embedding", "vec_id", m=2, k=2)
    codes = pq_encode(df, "embedding", "vec_id", books)
    with pytest.raises(ValueError, match="max_queries"):
        pq_adc_topk(codes, books, df, "embedding", "vec_id", max_queries=3)
