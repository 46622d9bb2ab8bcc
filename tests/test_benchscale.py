"""Scaled-fixture generator invariants (datapipelines_spark/benchscale.py):
the 4x bench pass is only meaningful if the scaled data is a BIGGER version
of the same workload — consistent foreign keys, linear duplicate structure —
not a different one."""

import os

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from datapipelines_spark.benchscale import build_scaled_dir

SRC = "/root/testdata/sf0.001"
FACTOR = 3


@pytest.fixture(scope="module")
def scaled_dir(tmp_path_factory):
    out_root = str(tmp_path_factory.mktemp("scaled"))
    return build_scaled_dir(SRC, FACTOR, out_root=out_root)


def _rows(d, t):
    return pq.read_metadata(os.path.join(d, f"{t}.parquet")).num_rows


def test_fact_tables_scale_by_factor(scaled_dir):
    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "events", "documents", "embeddings"):
        assert _rows(scaled_dir, t) == FACTOR * _rows(SRC, t), t


def test_dimensions_not_replicated(scaled_dir):
    for t in ("region", "nation"):
        assert _rows(scaled_dir, t) == _rows(SRC, t), t


def test_keys_stay_unique_and_fks_resolve(scaled_dir):
    orders = pq.read_table(os.path.join(scaled_dir, "orders.parquet"))
    lineitem = pq.read_table(
        os.path.join(scaled_dir, "lineitem.parquet"), columns=["l_orderkey"]
    )
    custs = pq.read_table(
        os.path.join(scaled_dir, "customer.parquet"), columns=["c_custkey"]
    )
    okeys = orders.column("o_orderkey")
    assert len(pc.unique(okeys)) == len(okeys)
    ckeys = set(custs.column("c_custkey").to_pylist())
    assert set(orders.column("o_custkey").to_pylist()) <= ckeys
    assert set(lineitem.column("l_orderkey").to_pylist()) <= set(okeys.to_pylist())


def test_replica_zero_is_byte_identical(scaled_dir):
    src = pq.read_table(os.path.join(SRC, "documents.parquet"))
    out = pq.read_table(os.path.join(scaled_dir, "documents.parquet"))
    n = src.num_rows
    assert out.slice(0, n).equals(src)


def test_exact_duplicate_groups_scale_linearly(scaled_dir):
    """Token renaming must keep replicas disjoint: the number of exact-dup
    TEXT groups grows by exactly the factor, never quadratically."""
    import collections

    def group_sizes(path):
        texts = pq.read_table(path, columns=["text"]).column("text").to_pylist()
        c = collections.Counter(texts)
        return sorted(c.values(), reverse=True)

    src_sizes = group_sizes(os.path.join(SRC, "documents.parquet"))
    out_sizes = group_sizes(os.path.join(scaled_dir, "documents.parquet"))
    # every source group appears FACTOR times at its original size
    assert out_sizes == sorted(src_sizes * FACTOR, reverse=True)


def test_embeddings_replicas_are_not_duplicates(scaled_dir):
    tbl = pq.read_table(os.path.join(scaled_dir, "embeddings.parquet"))
    n = _rows(SRC, "embeddings")
    base = np.array(tbl.column("embedding").slice(0, n).to_pylist())
    rep = np.array(tbl.column("embedding").slice(n, n).to_pylist())
    # replica vectors are unit-norm and nowhere near cosine-1 with originals
    np.testing.assert_allclose(np.linalg.norm(rep, axis=1), 1.0, atol=1e-6)
    cos = np.abs(np.sum(base * rep, axis=1)) / np.maximum(
        np.linalg.norm(base, axis=1), 1e-12
    )
    assert float(np.max(cos)) < 0.45  # below the near-dup threshold used
