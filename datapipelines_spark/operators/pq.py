"""Product quantization (PQ) — the ANN compression path for billion-vector
corpora.

Brute-force cosine and IVF probing (operators/similarity.py, clustering.py)
still read full vectors; at 10^9+ vectors the index itself no longer fits.
Product quantization (Jegou/Douze/Schmid, "Product Quantization for Nearest
Neighbor Search", TPAMI 2011 — public) compresses each D-dim vector to M
small codes: split the vector into M subvectors, train a k-centroid
codebook per subspace, store argmin codes (M bytes at k<=256 vs 4·D bytes
of floats — 32x for D=64, M=8). Search uses the ASYMMETRIC distance (ADC):
the query precomputes an M x k table of subspace distances, and every
candidate's approximate distance is M table lookups — no float vector is
ever touched at scan time.

Spark shape:
- TRAIN: M independent Lloyd runs (operators/clustering.py:kmeans_fit) over
  array slices — each is the O(partitions x k) partial-sum shuffle, the
  corpus never shuffles; codebooks are (M, k, D/M) driver-side floats.
- ENCODE: ONE fused Arrow pass computes all M argmins per batch against the
  broadcast codebooks (same fused-stage discipline as the minhash
  signatures); output is (id, codes array<int>) — the compressed index.
- SEARCH: query distance tables are numpy (M x k per query, tiny),
  broadcast once; ONE Arrow pass scores every (query, candidate) as M
  lookups; per-query top-k is a partitioned window over the scored rows.

Determinism (what lets DuckDB oracle the whole pipeline): init = the k
lowest-id subvectors, argmin ties to the lowest code, fixed iteration
count, float64 everywhere — the same contract as clustering.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql import types as T

from datapipelines_spark.operators.clustering import _assign_batch, kmeans_fit


def pq_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 4,
    k: int = 4,
    max_iter: int = 1,
) -> np.ndarray:
    """Train per-subspace codebooks; returns (m, k, dim//m) float64.

    The vector dimension must divide evenly by ``m`` (checked against the
    first row). Each subspace trains independently with the deterministic
    kmeans contract (lowest-id init, ``tol=0`` fixed iterations)."""
    first = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    if not first:
        raise ValueError("pq_fit: empty input")
    dim = first[0]["d"]
    if dim % m:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for j in range(m):
        sliced = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias("__sub"),
        )
        cents, _ = kmeans_fit(
            sliced, "__sub", id_col, k=k, max_iter=max_iter, tol=0.0
        )
        books.append(cents)
    return np.stack(books)  # (m, k, sub)


def pq_encode(
    df: DataFrame, vec_col: str, id_col: str, codebooks: np.ndarray
) -> DataFrame:
    """(id, codes array<int>): per-subspace argmin codes, one Arrow pass."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(codebooks, dtype=np.float64))
    schema = T.StructType(
        [
            T.StructField("__id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def encode(batches):
        books = bc.value
        m, _, sub = books.shape
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf["v"]), dtype=np.float64)
            codes = np.empty((len(mat), m), dtype=np.int32)
            for j in range(m):
                codes[:, j] = _assign_batch(
                    mat[:, j * sub : (j + 1) * sub], books[j]
                )
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"].to_numpy(dtype=np.int64),
                    "codes": list(codes),
                }
            )

    proj = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    return proj.mapInPandas(encode, schema).withColumnRenamed("__id", id_col)


def pq_adc_topk(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    queries_df: DataFrame,
    vec_col: str,
    id_col: str,
    top_k: int = 5,
    max_queries: int = 10_000,
) -> DataFrame:
    """(query_id, vec_id, adist, rank): per-query top-k candidates by
    asymmetric PQ distance.

    Queries collect to the driver (bounded by ``max_queries`` — the same
    guard discipline as similarity.cosine_topk_vectorized); their M x k
    distance tables broadcast once; candidates are scored in one Arrow
    pass as M table lookups per row and ranked with a per-query window —
    the scan side never touches a float vector."""
    q_rows = queries_df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>")
    ).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(f"more than max_queries={max_queries} query rows")
    if not q_rows:
        raise ValueError("no query rows")
    books = np.asarray(codebooks, dtype=np.float64)
    m, k, sub = books.shape
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qmat = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    # (Q, m, k): squared distance from each query subvector to each centroid
    tables = np.empty((len(qids), m, k), dtype=np.float64)
    for j in range(m):
        qs = qmat[:, j * sub : (j + 1) * sub]
        tables[:, j, :] = ((qs[:, None, :] - books[j][None, :, :]) ** 2).sum(
            axis=2
        )
    spark = codes_df.sparkSession
    bc = spark.sparkContext.broadcast((qids, tables))
    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("__id", T.LongType()),
            T.StructField("adist", T.DoubleType()),
        ]
    )

    def score(batches):
        ids, tabs = bc.value
        nq = len(ids)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            cand = pdf["__id"].to_numpy(dtype=np.int64)
            # (Q, n): sequential sum over the M subspaces keeps the
            # addition order identical to the SQL oracle's
            dists = np.zeros((nq, len(cand)), dtype=np.float64)
            for j in range(tabs.shape[1]):
                dists += tabs[:, j, :][:, codes[:, j]]
            # PARTIAL top-k per batch: only Q*k rows leave the stage (the
            # global top-k of a union of per-batch top-ks is exact), so the
            # shuffle carries O(Q * k * batches), never Q * corpus —
            # same discipline as similarity.cosine_topk_vectorized.
            # Tie-order parity: candidates within a batch are sorted by
            # (adist, id) before the cut, matching the final window's order.
            kk = min(top_k, len(cand))
            cand2d = np.broadcast_to(cand, dists.shape)
            order_in_batch = np.lexsort((cand2d, dists))  # dists primary
            rows, out_q, out_id, out_d = len(cand), [], [], []
            for qi in range(nq):
                sel = order_in_batch[qi, :kk] if rows > kk else order_in_batch[qi]
                out_q.append(np.full(len(sel), ids[qi]))
                out_id.append(cand[sel])
                out_d.append(dists[qi, sel])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "__id": np.concatenate(out_id),
                    "adist": np.concatenate(out_d),
                }
            )

    proj = codes_df.select(F.col(id_col).alias("__id"), "codes")
    scored = proj.mapInPandas(score, schema).withColumnRenamed("__id", id_col)
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", id_col, "adist", "rank")
    )


def pq_adc_rerank_topk(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    queries_df: DataFrame,
    vectors_df: DataFrame,
    vec_col: str,
    id_col: str,
    shortlist: int = 50,
    top_k: int = 5,
    max_queries: int = 10_000,
) -> DataFrame:
    """(query_id, vec_id, dist, rank): ADC shortlist + EXACT re-rank — the
    production PQ search shape (Jegou'11 §V: quantization error makes raw
    ADC ranks approximate; re-scoring a C-deep shortlist against the true
    vectors restores near-exact top-k at C/N of the exact cost). The
    measured contract on the embeddings fixture: recall@10 >= 0.9 with a
    100-deep shortlist (tests/test_pq.py).

    Scale shape: the compressed scan proposes ``shortlist`` candidates per
    query (never touching a float vector); only the Q x C shortlist — tiny
    by construction — is broadcast against the vector table, so exact
    scoring reads the true vectors for candidates ONLY, as a broadcast
    semi-join with no shuffle of the corpus; the final window ranks Q x C
    rows."""
    short = pq_adc_topk(
        codes_df, codebooks, queries_df, vec_col, id_col,
        top_k=shortlist, max_queries=max_queries,
    )
    vecs = vectors_df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    qv = queries_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    # exact squared L2, summed dim-ascending (left fold) — the same
    # accumulation order as the oracle's list_sum(list_transform(...))
    sq = F.aggregate(
        F.zip_with(F.col("__qv"), F.col("__v"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc(id_col))
    return (
        F.broadcast(short.select("query_id", id_col))
        .join(vecs, id_col)
        .join(F.broadcast(qv), "query_id")
        .withColumn("dist", sq)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", id_col, "dist", "rank")
    )
