"""Empty-input robustness: the driver always runs populated fixtures, so
crash paths on zero-row tables never surface there. An empty partition,
filter-to-nothing upstream stage, or fresh table is an ordinary production
state — operators must return empty results (or raise their documented
fit contracts), never fold an ANSI 1/0 or die on schema inference over
zero written files."""

import pyspark.sql.functions as F


def _empty_dir(spark, sf_dir, tmp_path_factory, tables):
    from datapipelines_spark.sources.parquet import load_table

    out = tmp_path_factory.mktemp("sf_empty")
    for t in tables:
        load_table(spark, sf_dir, t).limit(0).coalesce(1).write.parquet(
            str(out / f"{t}.parquet")
        )
    return str(out)


def test_pagerank_empty_graph(spark):
    from datapipelines_spark.operators.components import pagerank

    edges = spark.createDataFrame([], "src long, dst long, weight double")
    out = pagerank(edges)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_partition_pruned_scan_empty_source(spark, sf_dir, tmp_path_factory):
    """Zero partitions written -> the read-back must use the source schema,
    not file-footer inference (UNABLE_TO_INFER_SCHEMA pre-fix)."""
    from datapipelines_spark.queries.layout import partition_pruned_scan

    d = _empty_dir(spark, sf_dir, tmp_path_factory, ["orders"])
    assert partition_pruned_scan(spark, d).count() == 0


def test_jsonl_gz_roundtrip_empty_source(spark, sf_dir, tmp_path_factory):
    """Zero JSON-lines written -> inference has nothing to read; the source
    schema is authoritative."""
    from datapipelines_spark.queries.layout import jsonl_gz_roundtrip

    d = _empty_dir(spark, sf_dir, tmp_path_factory, ["documents"])
    assert jsonl_gz_roundtrip(spark, d).count() == 0


def test_connected_components_empty_edges(spark):
    from datapipelines_spark.operators.components import connected_components

    edges = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(edges).count() == 0
