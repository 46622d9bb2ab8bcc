"""End-to-end vector search over an embedding corpus: the ANN workflow at
toy scale.

train (distributed Lloyd's k-means) -> index (assign vectors to learned IVF
cells) -> search (probe the nearest cells, exact cosine within) -> compare
against the exact BLAS top-k ground truth to report recall -> compress the
index with product quantization and report the ADC recall at 32x smaller
index bytes.

Every stage is a composable operator from datapipelines_spark — the same
ones the oracle-checked catalog queries (kmeans_centroids_2iter,
sim_ivf_kmeans_topk, sim_topk_bruteforce) run. At 100 TB the shapes hold:
training shuffles O(partitions x k) partials, indexing is one broadcast
Arrow pass, search scores corpus x probes/k pairs instead of
corpus x queries.

Run:  python examples/ann_pipeline.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelines_spark.operators.clustering import kmeans_assign, kmeans_fit
from datapipelines_spark.operators.similarity import cosine_topk_vectorized
from datapipelines_spark.session import get_spark
from datapipelines_spark.sources.parquet import load_table


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="ann_pipeline")
    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()

    # 1) TRAIN: k-means coarse quantizer (deterministic init, early stop)
    cents, iters = kmeans_fit(e, "embedding", "vec_id", k=8, max_iter=20, tol=1e-6)
    print(f"trained k=8 centroids on {n} vectors in {iters} Lloyd iterations")

    # 2) INDEX: one Arrow pass assigns every vector to its nearest cell
    cells = kmeans_assign(e, "embedding", "vec_id", cents)
    hist = cells.groupBy("cluster").count().orderBy("cluster").collect()
    print("cell sizes:", {r["cluster"]: r["count"] for r in hist})

    # 3) SEARCH: exact-cosine ground truth via the BLAS path (queries =
    # every 100th vector), used here both as the searcher and the recall
    # yardstick for the IVF probe (see queries/vectors.py:sim_ivf_kmeans_topk
    # for the probe-2 formulation of the same pipeline)
    topk = cosine_topk_vectorized(
        e, "embedding", "vec_id", query_pred=F.col("vec_id") % 100 == 0, k=5
    )
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in topk.collect()
    }
    print(f"exact top-5: {len(exact)} (query, neighbor) pairs")

    # recall of the IVF search against that ground truth
    qcells = (
        kmeans_assign(e.where(F.col("vec_id") % 100 == 0), "embedding", "vec_id", cents)
        .withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("cluster", "qcell")
    )
    neighbor_cells = cells.withColumnRenamed("vec_id", "neighbor_id")
    # a pair is reachable when the neighbor shares the query's cell
    # (probe-1); the full probe-N ranking lives in sim_ivf_kmeans_topk
    qc = {r["query_id"]: r["qcell"] for r in qcells.collect()}
    nc = {r["neighbor_id"]: r["cluster"] for r in neighbor_cells.collect()}
    reachable = sum(1 for (q, nb) in exact if nc.get(nb) == qc.get(q))
    print(
        f"probe-1 recall vs exact: {reachable}/{len(exact)} "
        f"({reachable / max(len(exact), 1):.1%}) — raise probes for more"
    )

    # 4) COMPRESS: product quantization — the index drops from 4*D bytes of
    #    floats per vector to M single-byte codes; search never touches a
    #    float vector (asymmetric-distance table lookups)
    from datapipelines_spark.operators.pq import pq_adc_topk, pq_encode, pq_fit

    # L2-normalize first so ADC's squared-euclidean ranking coincides with
    # the cosine ground truth above (d^2 = 2 - 2*cos on unit vectors)
    nrm = F.sqrt(
        F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x)
    )
    en = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x / nrm).alias("embedding"),
    )
    books = pq_fit(en, "embedding", "vec_id", m=16, k=16, max_iter=3)
    codes = pq_encode(en, "embedding", "vec_id", books)
    pq_top = pq_adc_topk(
        codes, books, en.where(F.col("vec_id") % 100 == 0),
        "embedding", "vec_id", top_k=5,
    )
    approx = {(r["query_id"], r["vec_id"]) for r in pq_top.collect()}
    hit = len(exact & approx)
    print(
        f"PQ ADC recall@5 vs exact: {hit}/{len(exact)} "
        f"({hit / max(len(exact), 1):.1%}) at m=16, k=16 "
        f"(8 code bytes vs {64 * 4} float bytes = 32x index compression)"
    )

    # 5) SQ8: the zero-training quantizer — one byte per dimension from the
    #    corpus min/max, integer code-space L2 shortlist, exact cosine
    #    re-rank (how sim_sq8_rerank_topk runs; at 10^9 vectors it layers
    #    under the IVF cells exactly like PQ — sim_ivf_sq8_topk)
    from datapipelines_spark.operators.sq import sq8_adc_rerank_topk

    sq_top = sq8_adc_rerank_topk(
        e, e.where(F.col("vec_id") % 100 == 0),
        "embedding", "vec_id", shortlist=25, top_k=5,
    )
    sq_pairs = {(r["query_id"], r["neighbor_id"]) for r in sq_top.collect()}
    hit = len(exact & sq_pairs)
    print(
        f"SQ8 rerank recall@5 vs exact: {hit}/{len(exact)} "
        f"({hit / max(len(exact), 1):.1%}) at 1 byte/dim "
        f"(64 code bytes vs {64 * 4} float bytes = 4x index compression, "
        f"no codebook training)"
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
