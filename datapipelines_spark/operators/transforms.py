"""Config-instantiable mappers and filters (SURVEY §2.5 parity).

The reference's transform surface is classes with ``__call__(sample)`` built
from YAML ``target/params`` nodes (mappers/base.py:10-67, filters/base.py:9-64,
sample_mappers.py, metadata_filters.py). Here each operator is a class with
``apply(DataFrame) -> DataFrame`` emitting declarative column expressions, so
a config-built pipeline still compiles to one Catalyst plan (filters written
last still push down to the scan).

``exclude_keys`` parity: the reference skips a transform for samples whose
``__url__`` contains any of the given substrings (mappers/base.py:29-32).
Relationally that's a conditional expression on the url column — transformed
and untransformed rows coexist in one column.

Permissive error handling (E1 warn_and_continue parity) for expression-based
transforms means "null on failure" (ANSI off) + optional row drop; UDF-based
stages wrap exceptions explicitly (see multimodal.py).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


class Transform:
    """Base: optional ``exclude_keys`` guard on a url column."""

    def __init__(self, exclude_keys: Sequence[str] = (), url_col: str = "__url__") -> None:
        self.exclude_keys = list(exclude_keys)
        self.url_col = url_col

    def _skip_pred(self, df: DataFrame) -> Column | None:
        """True for rows this transform must leave untouched."""
        if not self.exclude_keys or self.url_col not in df.columns:
            return None
        pred = F.lit(False)
        for frag in self.exclude_keys:
            pred = pred | F.col(self.url_col).contains(frag)
        return pred

    def apply(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def _guarded_column(self, df: DataFrame, key: str, expr: Column) -> DataFrame:
        skip = self._skip_pred(df)
        if skip is not None:
            expr = F.when(skip, F.col(key)).otherwise(expr)
        return df.withColumn(key, expr)


class ColumnMap(Transform):
    """LambdaMapper parity (M2, mappers/base.py:40-67): apply an expression
    factory to each of ``keys`` in place. ``fn`` maps Column -> Column —
    prefer native functions; wrap a Python fn in F.udf only as a last resort.
    """

    def __init__(self, keys: Sequence[str], fn: Callable[[Column], Column], **kw) -> None:
        super().__init__(**kw)
        self.keys = list(keys)
        self.fn = fn

    def apply(self, df: DataFrame) -> DataFrame:
        for k in self.keys:
            df = self._guarded_column(df, k, self.fn(F.col(k)))
        return df


class Rescaler(Transform):
    """M3 parity (sample_mappers.py:14-85): image/tensor normalization.
    float mode: x*2-1 (inputs in [0,1]); uint8 mode: x/127.5-1."""

    def __init__(self, key: str = "jpg", isfloat: bool = True, **kw) -> None:
        super().__init__(**kw)
        self.key = key
        self.isfloat = isfloat

    def apply(self, df: DataFrame) -> DataFrame:
        if self.isfloat:
            expr = F.transform(F.col(self.key), lambda x: x * 2 - 1)
        else:
            expr = F.transform(F.col(self.key), lambda x: x / 127.5 - 1)
        return self._guarded_column(df, self.key, expr)


class Filter(Transform):
    """Predicate base (F1): subclasses provide ``predicate(df)``; rows
    matching ``exclude_keys`` bypass the filter (kept unconditionally)."""

    def predicate(self, df: DataFrame) -> Column:
        raise NotImplementedError

    def apply(self, df: DataFrame) -> DataFrame:
        pred = self.predicate(df)
        skip = self._skip_pred(df)
        if skip is not None:
            pred = skip | pred
        return df.where(pred)


class LambdaFilter(Filter):
    """F2 parity (filters/base.py:34-64): AND of a predicate over ``keys``."""

    def __init__(self, keys: Sequence[str], fn: Callable[[Column], Column], **kw) -> None:
        super().__init__(**kw)
        self.keys = list(keys)
        self.fn = fn

    def predicate(self, df: DataFrame) -> Column:
        pred = F.lit(True)
        for k in self.keys:
            pred = pred & self.fn(F.col(k))
        return pred


class KeyFilter(Filter):
    """F3 parity (metadata_filters.py:9-28): keep rows where all ``keys``
    are present (non-null under fixed schema)."""

    def __init__(self, keys: Sequence[str], **kw) -> None:
        super().__init__(**kw)
        self.keys = list(keys)

    def predicate(self, df: DataFrame) -> Column:
        pred = F.lit(True)
        for k in self.keys:
            pred = pred & F.col(k).isNotNull()
        return pred


class SizeFilter(Filter):
    """F4 parity (metadata_filters.py:31-104): bound a size attribute.
    ``strict`` decides the fate of rows with a null size (drop if strict)."""

    def __init__(
        self,
        size_col: str,
        min_size: int | None = None,
        max_size: int | None = None,
        strict: bool = True,
        **kw,
    ) -> None:
        super().__init__(**kw)
        self.size_col = size_col
        self.min_size = min_size
        self.max_size = max_size
        self.strict = strict

    def predicate(self, df: DataFrame) -> Column:
        c = F.col(self.size_col)
        pred = F.lit(True)
        if self.min_size is not None:
            pred = pred & (c >= self.min_size)
        if self.max_size is not None:
            pred = pred & (c <= self.max_size)
        if not self.strict:
            pred = c.isNull() | pred
        return pred


class Renamer(Transform):
    """webdataset ``rename`` verb parity (SURVEY §2.9)."""

    def __init__(self, mapping: dict[str, str], **kw) -> None:
        super().__init__(**kw)
        self.mapping = dict(mapping)

    def apply(self, df: DataFrame) -> DataFrame:
        for old, new in self.mapping.items():
            df = df.withColumnRenamed(old, new)
        return df


class Selector(Transform):
    """``to_tuple``/projection parity: keep only ``keys``."""

    def __init__(self, keys: Sequence[str], **kw) -> None:
        super().__init__(**kw)
        self.keys = list(keys)

    def apply(self, df: DataFrame) -> DataFrame:
        return df.select(*self.keys)
