"""Z-order layout (operators/zorder.py): code correctness is oracle-checked
by the layout_zorder_orders catalog query; here we assert the LAYOUT EFFECT
— files written in Morton order carry footer min/max stats that prune
selective filters on EITHER dimension, where a single-column sort prunes
only its own column."""

import glob
import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from datapipelines_spark.operators.zorder import morton_code, zorder_codes, zorder_layout

N_FILES = 16


def _file_ranges(path, cols):
    """[(min, max) per col] for each data file, from parquet footers only.
    Recurses one level so ``partitionBy``-written layouts (dir per
    segment) and flat writes both work."""
    out = []
    files = sorted(
        glob.glob(os.path.join(path, "*.parquet"))
        + glob.glob(os.path.join(path, "*", "*.parquet"))
    )
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    mins[name] = st.min if mins[name] is None else min(mins[name], st.min)
                    maxs[name] = st.max if maxs[name] is None else max(maxs[name], st.max)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def _files_overlapping(ranges, col, lo, hi):
    return sum(1 for r in ranges if not (r[col][1] < lo or r[col][0] > hi))


def test_morton_code_reference_values(spark):
    df = spark.createDataFrame([(0, 0), (255, 0), (0, 255), (255, 255), (3, 5)], "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", morton_code(F.col("a"), F.col("b")).alias("z")).collect()
    }
    def ref(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z
    for (a, b), z in got.items():
        assert z == ref(a, b)
    assert got[(255, 255)] == 65535 and got[(0, 0)] == 0


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    # deterministic full 256x256 grid under a 16-way EQUAL-CODE split:
    # segment = top 4 Morton bits = (b[7], a[7], b[6], a[6]), so each
    # written file is EXACTLY one 64x64 tile — input-determined (no
    # sampled range boundaries), hence the rectangles and hit counts are
    # asserted exactly. A [115, 140] band crosses the 64-tile boundary at
    # 128, overlapping 2 of the 4 strips on either dimension = 8 of 16
    # files; the single-column sort layout cannot prune the other
    # dimension AT ALL.
    grid = spark.range(256 * 256).select(
        F.col("id"),
        (F.col("id") % 256).alias("a"),
        (F.col("id") / 256).cast("bigint").alias("b"),
    )
    z_path = str(tmp_path / "zorder")
    zorder_layout(grid, "a", "b", N_FILES).write.partitionBy(
        "zorder_seg"
    ).parquet(z_path)
    lin_path = str(tmp_path / "bya")
    grid.repartitionByRange(N_FILES, "a").sortWithinPartitions("a").write.parquet(
        lin_path
    )

    z_ranges = _file_ranges(z_path, ["a", "b"])
    lin_ranges = _file_ranges(lin_path, ["a", "b"])
    assert len(z_ranges) == N_FILES
    assert len(lin_ranges) > N_FILES // 2
    # every file is exactly a 64x64 tile aligned to the 64-grid
    for r in z_ranges:
        (a0, a1), (b0, b1) = r["a"], r["b"]
        assert (a0 % 64, b0 % 64) == (0, 0) and (a1 - a0, b1 - b0) == (63, 63), r

    lo, hi = 115, 140  # ~10% band
    # second dimension: the a-sorted layout reads EVERY file; z-order
    # reads exactly the 2 overlapping strips (8 of 16 tiles)
    assert _files_overlapping(lin_ranges, "b", lo, hi) == len(lin_ranges)
    assert _files_overlapping(z_ranges, "b", lo, hi) == 8
    # first dimension prunes identically (rectangles, not stripes)
    assert _files_overlapping(z_ranges, "a", lo, hi) == 8


def test_zorder_codes_plan_is_one_codegen_stage(spark, sf_dir):
    """No exchange, no Python: the Morton code must compile to a single
    whole-stage-codegen Project over the scan (plus the 1-row stats job)."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    plan = (
        zorder_codes(orders, "o_custkey", "cents")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert "shiftleft" in plan  # the interleave really is JVM expression math
