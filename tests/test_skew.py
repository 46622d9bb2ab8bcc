import pyspark.sql.functions as F

from datapipelines_spark.functions.skew import salted_join, salted_sum


def test_salted_sum_matches_plain(spark):
    df = spark.range(50000).select(
        (F.when(F.col("id") % 100 < 90, "hot").otherwise(F.col("id").cast("string"))).alias("k"),
        F.col("id").cast("double").alias("v"),
        F.col("id"),
    )
    salted = {
        r["k"]: r["sum_v"] for r in salted_sum(df, ["k"], "v", "id", n_salts=8).collect()
    }
    plain = {
        r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    probe = spark.range(20000).select(
        (F.col("id") % 5).alias("k"), F.col("id")
    )
    build = spark.createDataFrame([(i, f"dim{i}") for i in range(5)], "k long, name string")
    salted = salted_join(probe, build, on="k", n_salts=4, probe_unique_col="id")
    plain = probe.join(build, "k")
    assert salted.count() == plain.count() == 20000
    s = {(r["id"], r["name"]) for r in salted.collect()}
    p = {(r["id"], r["name"]) for r in plain.collect()}
    assert s == p
