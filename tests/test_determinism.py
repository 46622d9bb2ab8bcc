"""Retry/partitioning stability: every data-derived-randomness operator must
produce identical results regardless of physical partitioning — the property
that makes results reproducible under task retries and cluster resizing
(SURVEY §7.6 risk 2)."""

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st


def _ids(df):
    return sorted(r[0] for r in df.collect())


def test_rsample_invariant_under_repartitioning(spark):
    from datapipelines_spark.operators.fluent import rsample

    base = spark.range(5000)
    picked = [_ids(rsample(base.repartition(n), 0.25, "id").select("id")) for n in (1, 7, 32)]
    assert picked[0] == picked[1] == picked[2]
    assert 1000 < len(picked[0]) < 1500


def test_weighted_mix_invariant_under_repartitioning(spark):
    from datapipelines_spark.operators.mixing import weighted_mix

    a = spark.range(3000)
    results = []
    for n in (1, 11):
        out = weighted_mix({"a": a.repartition(n)}, {"a": 0.4}, key_col="id")
        results.append(_ids(out.select("id")))
    assert results[0] == results[1]


def test_split_proportions_invariant_and_disjoint(spark):
    from datapipelines_spark.operators.mixing import split_proportions

    df = spark.range(4000)
    s1 = [_ids(p.select("id")) for p in split_proportions(df.repartition(3), "id", [0.5, 0.5])]
    s2 = [_ids(p.select("id")) for p in split_proportions(df.repartition(17), "id", [0.5, 0.5])]
    assert s1 == s2
    assert set(s1[0]).isdisjoint(s1[1])


def test_deterministic_shuffle_stable_order(spark):
    from datapipelines_spark.operators.mixing import deterministic_shuffle

    df = spark.range(500).select(F.col("id"))
    o1 = [r["id"] for r in deterministic_shuffle(df.repartition(2), seed=7).collect()]
    o2 = [r["id"] for r in deterministic_shuffle(df.repartition(9), seed=7).collect()]
    o3 = [r["id"] for r in deterministic_shuffle(df, seed=8).collect()]
    assert o1 == o2
    assert o1 != sorted(o1)  # actually shuffled
    assert o1 != o3  # seed changes order


def test_crop_coords_invariant(spark):
    from datapipelines_spark.operators.crop import add_size_and_square_crop

    df = spark.createDataFrame(
        [(f"k{i}", 32 + i, 48 + (i * 7) % 40) for i in range(100)],
        "`__key__` string, h int, w int",
    )
    a = {r["__key__"]: (r["crop_top"], r["crop_left"]) for r in
         add_size_and_square_crop(df.repartition(1), "h", "w").collect()}
    b = {r["__key__"]: (r["crop_top"], r["crop_left"]) for r in
         add_size_and_square_crop(df.repartition(13), "h", "w").collect()}
    assert a == b


class TestAsofProperty:
    @given(
        quotes=st.lists(
            st.tuples(st.integers(1, 3), st.integers(0, 1000), st.integers(1, 99)),
            min_size=1, max_size=12, unique_by=lambda t: (t[0], t[1]),
        ),
        trades=st.lists(
            st.tuples(st.integers(1, 4), st.integers(0, 1000)),
            min_size=1, max_size=8,
        ),
    )
    @settings(max_examples=8, deadline=None)
    def test_asof_equals_range_reference(self, spark, quotes, trades):
        import datetime as dt

        from datapipelines_spark.operators.asof import asof_join, asof_join_via_range

        base = dt.datetime(2024, 1, 1)
        q = spark.createDataFrame(
            [(k, base + dt.timedelta(minutes=m), float(p)) for k, m, p in quotes],
            "sym int, qts timestamp_ntz, px double",
        )
        t = spark.createDataFrame(
            [(i, k, base + dt.timedelta(minutes=m)) for i, (k, m) in enumerate(trades)],
            "trade_id int, sym int, tts timestamp_ntz",
        )
        fast = asof_join(t, q, key="sym", left_time="tts", right_time="qts", right_values=["px"])
        slow = asof_join_via_range(
            t, q, key="sym", left_time="tts", right_time="qts", right_values=["px"]
        )
        assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))


def test_pack_sequences_invariants_and_repartition_stability(spark):
    """Packing must (a) be invariant under physical partitioning, (b) keep
    every offset inside the budget, (c) start each partition group at pack 0
    offset 0, and (d) be contiguous: consecutive docs differ by exactly the
    previous doc's token count (mod budget)."""
    import pyspark.sql.functions as F

    from datapipelines_spark.operators.packing import pack_sequences

    base = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).alias("src"),
        ((F.col("id") * 37) % 190 + 10).alias("n_tokens"),
    )
    budget = 512
    outs = []
    for n in (1, 5, 32):
        out = pack_sequences(
            base.repartition(n), "n_tokens", "doc_id", budget, ("src",)
        )
        outs.append(sorted(tuple(r) for r in out.collect()))
    assert outs[0] == outs[1] == outs[2]

    rows = sorted(outs[0], key=lambda r: (r[1], r[0]))  # (src, doc_id)
    by_src = {}
    for doc_id, src, n_tokens, pack_id, offset in rows:
        assert 0 <= offset < budget
        cum = by_src.get(src, 0)
        assert pack_id == cum // budget and offset == cum % budget
        by_src[src] = cum + n_tokens


def test_pack_sequences_exact_past_double_precision(spark):
    """pack_id is INTEGER division of the running token sum: once the
    cumulative count passes 2^53, double division can round an exact
    quotient 1 ulp off before the truncating cast (the oversample_to_parity
    factor bug class). Pin exactness with a cumulative sum no double can
    represent."""
    from datapipelines_spark.operators.packing import pack_sequences

    big = (1 << 60) + 1  # not representable as a double
    df = spark.createDataFrame(
        [(0, big), (1, 7), (2, 7)], "doc_id long, n_tokens long"
    )
    out = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_sequences(df, "n_tokens", "doc_id", 3).collect()
    }
    assert out[0] == (0, 0)
    assert out[1] == (big // 3, big % 3)
    assert out[2] == ((big + 7) // 3, (big + 7) % 3)


def test_pack_sequences_rejects_nonpositive_budget(spark):
    import pytest

    from datapipelines_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(0, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "n_tokens", "doc_id", 0)
