"""Einops pattern parity: the index-arithmetic expression path must agree
with numpy's reshape/transpose/reduce on the same row-major data (einops
itself is not installed; numpy IS its reference semantics for these ops)."""

import numpy as np
import pytest

from datapipelines_spark.operators.einops import einops_apply, einops_expr, parse_pattern


def _run(spark, data, **kw):
    df = spark.createDataFrame([(1, [float(x) for x in data])], "id int, t array<double>")
    return _rows(einops_apply(df, "t", **kw))[0]


def _rows(df):
    return [r["t"] for r in df.orderBy("id").collect()]


def test_rearrange_transpose(spark):
    t = np.arange(24.0).reshape(2, 3, 4)
    got = _run(spark, t.ravel(), pattern="a b c -> c a b", mode="rearrange",
               sizes={"a": 2, "b": 3, "c": 4})
    assert got == list(np.transpose(t, (2, 0, 1)).ravel())


def test_rearrange_merge_and_split(spark):
    t = np.arange(12.0).reshape(6, 2)
    # split the 6 into (a=2, b=3), then emit 'b (c a)'
    got = _run(spark, t.ravel(), pattern="(a b) c -> b (c a)", mode="rearrange",
               sizes={"a": 2, "b": 3, "c": 2})
    want = np.transpose(t.reshape(2, 3, 2), (1, 2, 0)).reshape(3, 4)
    assert got == list(want.ravel())


def test_rearrange_infers_one_axis_from_length(spark):
    t = np.arange(10.0)
    got = _run(spark, t, pattern="(a b) -> b a", mode="rearrange",
               sizes={"b": 5}, in_len=10)
    assert got == list(t.reshape(2, 5).T.ravel())


def test_repeat_new_trailing_axis(spark):
    t = np.array([1.0, 2.0, 3.0])
    got = _run(spark, t, pattern="a -> a r", mode="repeat", sizes={"a": 3, "r": 2})
    assert got == [1.0, 1.0, 2.0, 2.0, 3.0, 3.0]


def test_repeat_new_leading_axis_tiles(spark):
    t = np.array([1.0, 2.0, 3.0])
    got = _run(spark, t, pattern="a -> r a", mode="repeat", sizes={"a": 3, "r": 2})
    assert got == [1.0, 2.0, 3.0, 1.0, 2.0, 3.0]


@pytest.mark.parametrize("reduction,npfn", [
    ("sum", np.sum), ("mean", np.mean), ("max", np.max), ("min", np.min),
])
def test_reduce_axes(spark, reduction, npfn):
    t = np.arange(24.0).reshape(2, 3, 4) * 1.5
    got = _run(spark, t.ravel(), pattern="a b c -> b", mode="reduce",
               sizes={"a": 2, "b": 3, "c": 4}, reduction=reduction)
    assert got == pytest.approx(list(npfn(t, axis=(0, 2))))


def test_reduce_keeps_axis_order(spark):
    t = np.arange(24.0).reshape(2, 3, 4)
    got = _run(spark, t.ravel(), pattern="a b c -> c a", mode="reduce",
               sizes={"a": 2, "b": 3, "c": 4}, reduction="sum")
    assert got == pytest.approx(list(t.sum(axis=1).T.ravel()))


def test_pattern_validation_errors():
    with pytest.raises(ValueError, match="exactly once"):
        parse_pattern("a b -> a", "rearrange", {"a": 2, "b": 3})
    with pytest.raises(ValueError, match="may not drop"):
        parse_pattern("a b -> a", "repeat", {"a": 2, "b": 3})
    with pytest.raises(ValueError, match="may not introduce"):
        parse_pattern("a -> a r", "reduce", {"a": 2, "r": 3})
    with pytest.raises(ValueError, match="ellipsis"):
        parse_pattern("... a -> a ...", "rearrange", {"a": 2})
    with pytest.raises(ValueError, match="need explicit"):
        parse_pattern("a -> a r", "repeat", {"a": 2})
    with pytest.raises(ValueError, match="not divisible"):
        parse_pattern("(a b) -> b a", "rearrange", {"b": 3}, in_len=10)


def test_plan_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, list(map(float, range(12))))], "id int, t array<double>")
    out = einops_apply(df, "t", pattern="(a b) -> b a", mode="rearrange", sizes={"a": 3, "b": 4})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure expression, no Python workers
