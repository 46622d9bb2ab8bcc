"""Property-based tests (SURVEY §5.2): shard expansion and collation
round-trips under hypothesis-generated inputs."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelines_spark.operators.fluent import create_dummy_dataset  # noqa: F401 (import check)
from datapipelines_spark.sinks.loader import dict_collate
from datapipelines_spark.sources.shards import shard_expand

_name = st.text(alphabet=string.ascii_lowercase + "-_", min_size=0, max_size=8)


class TestShardExpandProperties:
    @given(prefix=_name, lo=st.integers(0, 50), width=st.integers(1, 30), pad=st.integers(2, 5))
    @settings(max_examples=200, deadline=None)
    def test_padded_range_count_and_order(self, prefix, lo, width, pad):
        hi = lo + width
        if len(str(hi)) > pad:
            return  # spec invalid: high bound wider than pad
        spec = f"{prefix}{{{lo:0{pad}d}..{hi:0{pad}d}}}.tar"
        out = shard_expand(spec)
        assert len(out) == width + 1
        assert out == [f"{prefix}{i:0{pad}d}.tar" for i in range(lo, hi + 1)]
        # idempotent: results contain no further ranges
        assert all(shard_expand(p) == [p] for p in out)

    @given(s=st.text(alphabet=string.printable.replace("{", "").replace("}", ""), max_size=30))
    @settings(max_examples=100, deadline=None)
    def test_no_brace_is_identity(self, s):
        assert shard_expand(s) == [s]

    @given(a=st.integers(0, 5), b=st.integers(0, 5), c=st.integers(0, 5), d=st.integers(0, 5))
    @settings(max_examples=50, deadline=None)
    def test_double_range_is_cartesian(self, a, b, c, d):
        if not (a < b and c < d):
            return
        out = shard_expand(f"x{{{a}..{b}}}y{{{c}..{d}}}.tar")
        assert len(out) == (b - a + 1) * (d - c + 1)
        assert len(set(out)) == len(out)


class TestCollateProperties:
    @given(
        rows=st.lists(
            st.fixed_dictionaries(
                {"a": st.integers(-1000, 1000), "b": st.floats(allow_nan=False, allow_infinity=False, width=32)}
            ),
            min_size=1,
            max_size=20,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_collate_roundtrip_scalars(self, rows):
        batch = dict_collate(rows)
        assert set(batch) == {"a", "b"}
        assert batch["a"].tolist() == [r["a"] for r in rows]
        # unbatch(batch(x)) == x
        rebuilt = [
            {"a": int(batch["a"][i]), "b": float(batch["b"][i])} for i in range(len(rows))
        ]
        assert rebuilt == [{"a": r["a"], "b": float(r["b"])} for r in rows]

    @given(
        n_keys=st.integers(1, 4),
        n_rows=st.integers(1, 10),
        missing=st.booleans(),
    )
    @settings(max_examples=50, deadline=None)
    def test_key_intersection_semantics(self, n_keys, n_rows, missing):
        keys = [f"k{i}" for i in range(n_keys)]
        rows = [{k: i for k in keys} for i in range(n_rows)]
        if missing and n_rows > 1:
            rows[0] = dict(rows[0], extra=1)  # extra key in one row only
        batch = dict_collate(rows)
        assert set(batch) == set(keys)  # extra never survives intersection
