"""Stateful fuzz for the MOR upsert table (sinks/upsert.py): random
upsert / delete / compact sequences must keep the merged snapshot equal to
a dict replay at every step, and time travel must reproduce every
pre-compaction historical snapshot."""

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelines_spark.sinks.upsert import compact, read_merged, upsert_write

_KEYS = list(range(1, 7))

# an op is ("upsert", {key: val}), ("delete", [keys]) or ("compact", None);
# batches are dicts so one key never appears twice inside a delta (within-
# batch order is deliberately unspecified, like a table format's commit)
_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("upsert"),
            st.dictionaries(
                st.sampled_from(_KEYS), st.integers(-50, 50), min_size=1, max_size=4
            ),
        ),
        st.tuples(
            st.just("delete"),
            st.lists(st.sampled_from(_KEYS), min_size=1, max_size=3, unique=True),
        ),
        st.tuples(st.just("compact"), st.none()),
    ),
    min_size=1,
    max_size=8,
)


def _snapshot(spark, path, as_of=None):
    return {
        r["k"]: r["val"]
        for r in read_merged(spark, path, ["k"], as_of_version=as_of).collect()
    }


@settings(max_examples=15, deadline=None)
@given(ops=_ops)
def test_random_mutation_sequence_matches_dict_replay(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("mor") / "tbl")
    model: dict[int, int] = {}
    history: list[tuple[int, dict[int, int]]] = []  # (version, model snapshot)
    wrote_anything = False
    for op, arg in ops:
        if op == "upsert":
            df = spark.createDataFrame(
                [(k, v) for k, v in arg.items()], "k long, val long"
            )
            v = upsert_write(df, path)
            model.update(arg)
            wrote_anything = True
        elif op == "delete":
            if not wrote_anything:
                continue  # table must exist before tombstones land
            df = spark.createDataFrame([(k, 0) for k in arg], "k long, val long")
            v = upsert_write(df, path, delete=True)
            for k in arg:
                model.pop(k, None)
        else:
            if not wrote_anything:
                continue
            v = compact(spark, path, ["k"])
            history.clear()  # compaction drops pre-compaction history
        history.append((v, dict(model)))
        assert _snapshot(spark, path) == model
    # time travel must reproduce every surviving historical snapshot
    for v, snap in history:
        assert _snapshot(spark, path, as_of=v) == snap
