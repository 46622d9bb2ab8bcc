"""The Arrow (pandas-UDF) and expression implementations of shingling,
minhash signatures, and simhash must be bit-identical — the DuckDB oracles
embed the expression-path semantics, and operators are free to pick either
path by data shape."""

import pyspark.sql.functions as F

from datapipelines_spark.operators import dedup as ops
from datapipelines_spark.sources.parquet import load_table

CFG = ops.MinHashConfig(num_hashes=16, bands=4, ngram=3)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_shingles_identical(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = ops.doc_shingles(d, "text", "doc_id", 3, impl="arrow")
    e = ops.doc_shingles(d, "text", "doc_id", 3, impl="expr")
    rows_a = {r.doc_id: (r.shingles, r.n_sh) for r in a.collect()}
    rows_e = {r.doc_id: (r.shingles, r.n_sh) for r in e.collect()}
    assert rows_a == rows_e and rows_a


def test_minhash_signatures_identical(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = ops.minhash_signatures(d, "text", "doc_id", CFG, impl="arrow")
    e = ops.minhash_signatures(d, "text", "doc_id", CFG, impl="expr")
    rows_a = sorted(tuple(r) for r in a.collect())
    rows_e = sorted(tuple(r) for r in e.collect())
    assert rows_a == rows_e and rows_a


def test_simhash_identical(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = ops.simhash(d, "text", "doc_id", impl="arrow")
    e = ops.simhash(d, "text", "doc_id", impl="expr")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, e.collect()))


def test_lsh_pairs_identical_across_impls(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = ops.minhash_lsh_pairs(d, "text", "doc_id", CFG, 0.5, impl="arrow")
    e = ops.minhash_lsh_pairs(d, "text", "doc_id", CFG, 0.5, impl="expr")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, e.collect()))


def test_arrow_stage_is_vectorized_not_row_at_a_time(spark, sf_dir):
    plan = (
        ops.minhash_signatures(_docs(spark, sf_dir), "text", "doc_id", CFG, impl="arrow")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
