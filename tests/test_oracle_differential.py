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


def test_list_valued_query_fails_gate_loudly(spark):
    """A query emitting an array column must be rejected by the local gate
    BEFORE any value compare — the driver canonicalizer dies on list cells
    (r3: map_type_status_counts / einops / kmeans), so local green must
    imply driver green."""
    import pyspark.sql.functions as F

    from datapipelines_spark.testing import check_scalar_columns

    df = spark.range(3).select("id", F.array("id").alias("arr"))
    err = check_scalar_columns(df)
    assert err is not None and "arr" in err
