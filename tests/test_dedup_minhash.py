"""Cross-corpus MinHash LSH join (operators/dedup.py:minhash_lsh_join)."""


def test_minhash_lsh_join_cross_sides_only(spark):
    from datapipelines_spark.operators.dedup import MinHashConfig, minhash_lsh_join

    text = "the quick brown fox jumps over the lazy dog again and again today"
    rows_l = [(0, text), (2, "completely different words live here now ok fine")]
    rows_r = [(1, text), (3, "another unrelated set of tokens goes right here")]
    left = spark.createDataFrame(rows_l, "doc_id long, text string")
    right = spark.createDataFrame(rows_r, "doc_id long, text string")
    got = minhash_lsh_join(
        left, right, "text", "doc_id", MinHashConfig(num_hashes=16, bands=4, ngram=3)
    ).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in got] == [(0, 1, 1.0)]
