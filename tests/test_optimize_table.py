"""The one-call OPTIMIZE verb (operators/zorder.py:optimize_table): the
advisor argmin picks the layout, the partitioned write lands exactly one
file per nonempty segment, and the written rectangles equal the advisor's
prediction — the same code-range slicing on both sides."""

import pyspark.sql.functions as F

from datapipelines_spark.operators.zorder import (
    _quantize,
    layout_advisor,
    optimize_table,
)

BITS = 6
N_FILES = 12


def _grid(spark):
    # 48x48 integer grid with a hole: deterministic, spans both dims
    return (
        spark.range(48 * 48)
        .select(
            (F.col("id") % 48).alias("a"),
            (F.col("id") / 48).cast("bigint").alias("b"),
        )
        .where((F.col("a") + F.col("b")) % 7 != 0)
    )


def test_optimize_table_contract(spark, tmp_path):
    df = _grid(spark)
    out = str(tmp_path / "opt")
    info = optimize_table(df, "a", "b", out, bits=BITS, num_files=N_FILES)
    adv = {
        r["layout"]: r["sum_bbox_area"]
        for r in layout_advisor(df, "a", "b", BITS, n_segments=N_FILES).collect()
    }
    assert info["layout"] == min(adv, key=lambda k: (adv[k], k))
    assert info["code_col"] in ("zorder", "hilbert", "sortkey")

    back = spark.read.parquet(out)
    assert back.count() == df.count()
    stats = back.agg(
        F.min("a").alias("amin"), F.max("a").alias("amax"),
        F.min("b").alias("bmin"), F.max("b").alias("bmax"),
    ).collect()[0]
    qa = _quantize(F.col("a"), F.lit(stats["amin"]), F.lit(stats["amax"]), BITS)
    qb = _quantize(F.col("b"), F.lit(stats["bmin"]), F.lit(stats["bmax"]), BITS)
    seg_col = f"{info['code_col']}_seg"
    files = (
        back.select(
            F.col(seg_col).alias("seg"), F.input_file_name().alias("f"),
            qa.alias("qa"), qb.alias("qb"),
        )
        .groupBy("seg")
        .agg(
            F.countDistinct("f").alias("n_files"),
            F.min("qa").alias("a0"), F.max("qa").alias("a1"),
            F.min("qb").alias("b0"), F.max("qb").alias("b1"),
        )
        .collect()
    )
    assert 1 <= len(files) <= N_FILES
    assert all(r["n_files"] == 1 for r in files)  # one file per segment

    # the written rectangles ARE the advisor's predicted rectangles: both
    # are bounding boxes of the same equal-code-range segments
    got = {
        r["seg"]: (r["a0"], r["a1"], r["b0"], r["b1"]) for r in files
    }
    total_area = sum(
        (a1 - a0 + 1) * (b1 - b0 + 1) for a0, a1, b0, b1 in got.values()
    )
    assert total_area == adv[info["layout"]]


def test_optimize_table_overwrite_is_idempotent(spark, tmp_path):
    df = _grid(spark)
    out = str(tmp_path / "opt2")
    i1 = optimize_table(df, "a", "b", out, bits=BITS, num_files=N_FILES)
    i2 = optimize_table(df, "a", "b", out, bits=BITS, num_files=N_FILES)
    assert i1 == i2
    back = spark.read.parquet(out)
    assert back.count() == df.count()
