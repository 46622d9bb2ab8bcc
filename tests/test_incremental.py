"""Incremental aggregate maintenance (operators/incremental.py): the merge
must be order-independent, retractions must subtract exactly, and fully
retracted groups must vanish."""

import pyspark.sql.functions as F

from datapipelines_spark.operators.incremental import (
    aggregate_state,
    merge_states,
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k string, x double")


def _view(df):
    return {
        r["k"]: (r["__cnt"], float(r["sum_x"]))
        for r in df.collect()
    }


def test_slice_merge_equals_full_recompute_any_order(spark):
    rows = [(chr(97 + i % 3), float(i) + 0.25) for i in range(30)]
    full = _view(aggregate_state(_rows(spark, rows), ["k"], ["x"]))
    # three arbitrary slices, merged in two different orders
    s0 = aggregate_state(_rows(spark, rows[:7]), ["k"], ["x"])
    s1 = aggregate_state(_rows(spark, rows[7:19]), ["k"], ["x"])
    s2 = aggregate_state(_rows(spark, rows[19:]), ["k"], ["x"])
    m_fwd = merge_states(merge_states(s0, s1, ["k"]), s2, ["k"])
    m_rev = merge_states(merge_states(s2, s0, ["k"]), s1, ["k"])
    assert _view(m_fwd) == full
    assert _view(m_rev) == full


def test_retraction_subtracts_exactly(spark):
    base = [("a", 1.5), ("a", 2.5), ("b", 4.0)]
    state = aggregate_state(_rows(spark, base), ["k"], ["x"])
    delta = spark.createDataFrame(
        [("a", 2.5, True), ("b", 6.0, False)], "k string, x double, r boolean"
    )
    merged = merge_states(
        state, aggregate_state(delta, ["k"], ["x"], retract_col="r"), ["k"]
    )
    assert _view(merged) == {"a": (1, 1.5), "b": (2, 10.0)}


def test_fully_retracted_group_vanishes(spark):
    state = aggregate_state(_rows(spark, [("a", 3.0), ("b", 1.0)]), ["k"], ["x"])
    delta = spark.createDataFrame([("a", 3.0, True)], "k string, x double, r boolean")
    merged = merge_states(
        state, aggregate_state(delta, ["k"], ["x"], retract_col="r"), ["k"]
    )
    assert _view(merged) == {"b": (1, 1.0)}
    assert merged.where(F.col("k") == "a").count() == 0


def test_incremental_state_sink_multi_batch_with_retraction(spark, tmp_path):
    """Drive the foreachBatch callback directly: three batches (the third
    carrying a retraction) must leave the state equal to the net
    aggregate, and a fully retracted group must vanish from the view."""
    from datapipelines_spark.operators.incremental import incremental_state_sink

    state = str(tmp_path / "state")
    sink = incremental_state_sink(state, ["k"], ["x"], retract_col="r")

    def batch(rows):
        return spark.createDataFrame(rows, "k string, x double, r boolean")

    sink(batch([("a", 1.0, False), ("b", 2.0, False)]), 0)
    sink(batch([("a", 3.0, False), ("c", 5.0, False)]), 1)
    sink(batch([("b", 2.0, True)]), 2)  # retract b entirely
    got = {
        r["k"]: (r["__cnt"], float(r["sum_x"]))
        for r in spark.read.parquet(state).collect()
    }
    assert got == {"a": (2, 4.0), "c": (1, 5.0)}
