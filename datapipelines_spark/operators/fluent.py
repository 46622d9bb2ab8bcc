"""webdataset FluidInterface verb parity (SURVEY §2.9).

The reference's pipeline object inherits webdataset's fluent verbs
(/root/reference/sdata/datapipeline.py:306 subclasses
``wds.compat.FluidInterface``); the repo exercises map/select/batched/decode,
and the rest map onto one-liners here so a user migrating configs keeps the
same vocabulary. Everything returns a DataFrame, so verbs chain with any
engine operator.

| wds verb    | here        |
|-------------|-------------|
| to_tuple    | to_tuple    |
| rename      | rename      |
| rsample     | rsample     |
| slice       | slice_rows  |
| unbatched   | unbatch     |
| map_dict    | map_dict    |
| with_epoch  | with_epoch (= mixing.epoch_repeat) |
| shuffle     | mixing.deterministic_shuffle |
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from datapipelines_spark.functions.hashing import deterministic_sample_pred


def to_tuple(df: DataFrame, *cols: str) -> DataFrame:
    """Projection to the named columns, in order."""
    return df.select(*cols)


def rename(df: DataFrame, **mapping: str) -> DataFrame:
    """``rename(new=old, ...)`` — webdataset's keyword convention."""
    for new, old in mapping.items():
        df = df.withColumnRenamed(old, new)
    return df


def rsample(df: DataFrame, fraction: float, key_col: str, seed: int | str = 42) -> DataFrame:
    """Deterministic Bernoulli sample keyed on data (not row position):
    stable under retries/repartition, unlike ``df.sample``."""
    return df.where(deterministic_sample_pred(key_col, fraction, seed))


def slice_rows(df: DataFrame, limit: int, offset: int = 0, order_by: Sequence[str] | None = None) -> DataFrame:
    """LIMIT/OFFSET with a required deterministic order (an unordered slice
    is nondeterministic on a cluster — the verb forces the caller to say
    which order they mean)."""
    keys = list(order_by or df.columns)
    if offset == 0:
        return df.orderBy(*keys).limit(limit)
    w = Window.orderBy(*keys)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
        .drop("__rn")
    )


def unbatch(df: DataFrame, array_col: str, out_col: str | None = None) -> DataFrame:
    """Explode an array column back to rows (wds ``unbatched``)."""
    out = out_col or array_col
    return df.withColumn(out, F.explode(F.col(array_col)))


def create_dummy_dataset(df: DataFrame, count: int = 1_000_000) -> DataFrame:
    """S7 parity (/root/reference/sdata/dummy.py:25-34): materialize ONE row
    and repeat it ``count`` times — isolates downstream throughput from
    source IO exactly like the reference's infinite single-sample loop,
    except bounded and distributed (cross join with a range, so the copies
    are generated executor-side, not collected)."""
    one = df.limit(1)
    spark = df.sparkSession
    return one.crossJoin(spark.range(count).select(F.col("id").alias("__copy")))


def map_dict(df: DataFrame, **fns) -> DataFrame:
    """wds ``map_dict`` parity (FluidInterface via
    /root/reference/sdata/datapipeline.py:306): apply a per-key transform to
    the named columns in place. Each value is either a ready ``Column``
    expression or a callable ``Column -> Column`` applied to the current
    column — the relational reading of "apply f to sample[key]"."""
    for name, fn in fns.items():
        df = df.withColumn(name, fn(F.col(name)) if callable(fn) else fn)
    return df


def with_epoch(df: DataFrame, count: int) -> DataFrame:
    """wds ``with_epoch`` parity: named fluent alias of
    ``mixing.epoch_repeat`` (D7) so migrating configs keep the verb."""
    from datapipelines_spark.operators.mixing import epoch_repeat

    return epoch_repeat(df, count)


class PromoteMembers:
    """Expand the tar-sample ``data`` map into real columns, one per member
    extension — the relational reading of "a sample is a dict keyed by
    extension" (/root/reference/sdata/custom_datapipes.py:292-322 builds
    that dict; here each requested extension becomes a typed column so
    downstream config stages address members by name, exactly like
    reference mappers address ``sample['jpg']``). Config-targetable:
    ``{"target": ...fluent.PromoteMembers, "params": {"keys": ["jpg","txt"]}}``.
    """

    def __init__(self, keys, data_col: str = "data", drop_data: bool = True) -> None:
        self.keys = list(keys)
        self.data_col = data_col
        self.drop_data = drop_data

    def apply(self, df: DataFrame) -> DataFrame:
        for k in self.keys:
            df = df.withColumn(k, F.element_at(F.col(self.data_col), k))
        return df.drop(self.data_col) if self.drop_data else df
