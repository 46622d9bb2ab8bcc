"""Differential correctness: every catalog query with an oracle must match
DuckDB on the same parquet (the driver's t2 gate, run here at sf0.001 for
speed; the driver runs sf0.01)."""

import pytest

from datapipelines_spark.catalog import all_queries
from datapipelines_spark.testing import compare_query

QUERIES = sorted(all_queries())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    ok, detail = compare_query(spark, sf_dir, name)
    assert ok, f"{name}: {detail}"


def test_every_query_returns_rows(spark, sf_dir):
    for name, spec in all_queries().items():
        n = spec.builder(spark, sf_dir).limit(1).count()
        assert n >= 0, name
