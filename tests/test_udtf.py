import pyspark.sql.functions as F

from datapipelines_spark.operators.udtf import ChunkText, register_udtfs


def test_chunk_text_lateral_join(spark, sf_dir):
    from datapipelines_spark.sources.parquet import load_table

    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_v")
    out = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tokens
        FROM docs_v d, LATERAL chunk_text(d.text, 32, 4) c
        """
    )
    rows = out.where(F.col("doc_id") == out.select(F.min("doc_id")).first()[0]).collect()
    assert len(rows) >= 1
    assert all(r["n_tokens"] <= 32 for r in rows)


def test_chunk_text_overlap_semantics(spark):
    register_udtfs(spark)
    df = spark.sql("SELECT * FROM chunk_text('a b c d e f g h i j', 4, 1)")
    chunks = [r["chunk"] for r in df.orderBy("chunk_idx").collect()]
    # step = 3, window = 4: last token of each chunk re-appears in the next
    assert chunks[0] == "a b c d"
    assert chunks[1] == "d e f g"
    assert chunks[2] == "g h i j"


def test_chunk_text_null_and_empty(spark):
    register_udtfs(spark)
    assert spark.sql("SELECT * FROM chunk_text(NULL, 4, 1)").count() == 0
    assert spark.sql("SELECT * FROM chunk_text('', 4, 1)").count() == 0
