"""Einops pattern strings on array columns (M6 parity, Spark-native).

The reference's ``BatchedEinopsTransform``
(/root/reference/sdata/mappers/batched_mappers.py:9-34) passes a pattern
string to einops ``rearrange``/``repeat``/``reduce`` over an in-memory
batch tensor. Here a sample's tensor is a flat row-major array column, so
every einops mode is **closed-form index arithmetic**: output position →
multi-index over the output axes → input position(s). That compiles to
native ``transform``/``sequence``/``element_at``/``aggregate`` expressions
— row-local, JVM-side, zero shuffle, zero Python in the plan — which is the
Spark-first translation of a per-batch tensor op (einops itself is just
stride bookkeeping over a contiguous buffer).

Supported grammar: space-separated axis names, parenthesised groups for
split/merge (``(h w) c -> h w c`` needs the split sizes), new axes on the
right for ``repeat``, dropped axes for ``reduce`` (sum/mean/max/min).
Ellipsis and literal-1 axes are not supported (clear error).

For very large tensors per row, the numpy route via
``batched.batched_transform`` does the same thing Arrow-vectorized; this
expression path is the default because it keeps whole-stage codegen-able
plans and DuckDB-expressible oracles.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_REDUCTIONS = ("sum", "mean", "max", "min")


def _tokenize_side(side: str) -> list[list[str]]:
    """'(a b) c' -> [['a','b'], ['c']] — groups keep order; bare axes are
    singleton groups."""
    if "..." in side:
        raise ValueError("ellipsis ('...') is not supported in patterns")
    out: list[list[str]] = []
    group: list[str] | None = None
    for tok in side.replace("(", " ( ").replace(")", " ) ").split():
        if tok == "(":
            if group is not None:
                raise ValueError("nested parentheses are not supported")
            group = []
        elif tok == ")":
            if group is None:
                raise ValueError("unbalanced ')' in pattern")
            if not group:
                raise ValueError("empty '()' group in pattern")
            out.append(group)
            group = None
        else:
            if tok == "1":
                raise ValueError("literal-1 axes are not supported")
            if not tok.isidentifier():
                raise ValueError(f"invalid axis name {tok!r}")
            (out.append([tok]) if group is None else group.append(tok))
    if group is not None:
        raise ValueError("unbalanced '(' in pattern")
    return out


@dataclass(frozen=True)
class EinopsPlan:
    """Resolved pattern: flat axis orders and sizes for both sides."""

    in_order: tuple[str, ...]
    out_order: tuple[str, ...]
    sizes: dict[str, int]
    reduced: tuple[str, ...]  # input axes absent from the output (reduce mode)
    new: tuple[str, ...]  # output axes absent from the input (repeat mode)

    @property
    def in_len(self) -> int:
        return math.prod(self.sizes[a] for a in self.in_order)

    @property
    def out_len(self) -> int:
        return math.prod(self.sizes[a] for a in self.out_order)


def _strides(order: tuple[str, ...], sizes: dict[str, int]) -> dict[str, int]:
    st, acc = {}, 1
    for a in reversed(order):
        st[a] = acc
        acc *= sizes[a]
    return st


def parse_pattern(
    pattern: str, mode: str, sizes: dict[str, int] | None = None, in_len: int | None = None
) -> EinopsPlan:
    """Validate the pattern for ``mode`` and resolve every axis size.

    ``sizes`` must pin any axis not inferable: all-but-one member of each
    input group (the rest from ``in_len``), and every new axis in repeat.
    """
    if "->" not in pattern:
        raise ValueError(f"pattern {pattern!r} needs '->'")
    lhs, rhs = (s.strip() for s in pattern.split("->", 1))
    in_groups, out_groups = _tokenize_side(lhs), _tokenize_side(rhs)
    in_order = tuple(a for g in in_groups for a in g)
    out_order = tuple(a for g in out_groups for a in g)
    if len(set(in_order)) != len(in_order) or len(set(out_order)) != len(out_order):
        raise ValueError(f"duplicate axis name in {pattern!r}")
    new = tuple(a for a in out_order if a not in in_order)
    reduced = tuple(a for a in in_order if a not in out_order)
    if mode == "rearrange" and (new or reduced):
        raise ValueError(
            f"rearrange must use each axis exactly once on both sides; "
            f"new={list(new)} dropped={list(reduced)} in {pattern!r}"
        )
    if mode == "repeat" and reduced:
        raise ValueError(f"repeat may not drop axes ({list(reduced)}) in {pattern!r}")
    if mode == "reduce" and new:
        raise ValueError(f"reduce may not introduce axes ({list(new)}) in {pattern!r}")

    known = dict(sizes or {})
    for a, n in known.items():
        if n <= 0:
            raise ValueError(f"axis {a!r} size must be positive, got {n}")
    unknown = [a for a in in_order if a not in known]
    if len(unknown) > 1:
        raise ValueError(
            f"cannot infer sizes for {unknown}; pass all but one via sizes="
        )
    if unknown:
        if in_len is None:
            raise ValueError(
                f"axis {unknown[0]!r} has no size and in_len was not given"
            )
        prod = math.prod(known[a] for a in in_order if a in known)
        if prod == 0 or in_len % prod:
            raise ValueError(
                f"array length {in_len} is not divisible by known sizes {known}"
            )
        known[unknown[0]] = in_len // prod
    missing_new = [a for a in new if a not in known]
    if missing_new:
        raise ValueError(f"repeat axes {missing_new} need explicit sizes=")
    return EinopsPlan(in_order, out_order, known, reduced, new)


def _coord(i: Column, stride: int, size: int) -> Column:
    # positive ints well under 2^53: double division + truncating cast is exact
    return (i / F.lit(stride)).cast("long") % F.lit(size)


def einops_expr(
    arr: Column,
    pattern: str,
    mode: str = "rearrange",
    sizes: dict[str, int] | None = None,
    in_len: int | None = None,
    reduction: str = "mean",
) -> Column:
    """Compile ``pattern`` into a native array expression over ``arr``.

    ``in_len`` is the flat input length (required whenever one axis size is
    inferred). Output is ``array<double>`` in the pattern's row-major order.
    """
    if mode not in ("rearrange", "repeat", "reduce"):
        raise ValueError(f"mode must be rearrange/repeat/reduce, got {mode!r}")
    if mode == "reduce" and reduction not in _REDUCTIONS:
        raise ValueError(f"reduction must be one of {_REDUCTIONS}, got {reduction!r}")
    plan = parse_pattern(pattern, mode, sizes, in_len)
    in_st = _strides(plan.in_order, plan.sizes)
    out_st = _strides(plan.out_order, plan.sizes)
    arr = arr.cast("array<double>")

    def in_base(i: Column) -> Column:
        """Input flat index from the output-axis coordinates (kept axes)."""
        idx: Column = F.lit(0).cast("long")
        for a in plan.in_order:
            if a in plan.out_order:
                idx = idx + _coord(i, out_st[a], plan.sizes[a]) * F.lit(in_st[a])
        return idx

    out_idx = F.sequence(F.lit(0), F.lit(plan.out_len - 1))
    if mode in ("rearrange", "repeat"):
        return F.transform(out_idx, lambda i: F.element_at(arr, (in_base(i) + 1).cast("int")))

    red_st = _strides(plan.reduced, plan.sizes)
    n_red = math.prod(plan.sizes[a] for a in plan.reduced)

    def red_offset(j: Column) -> Column:
        off: Column = F.lit(0).cast("long")
        for a in plan.reduced:
            off = off + _coord(j, red_st[a], plan.sizes[a]) * F.lit(in_st[a])
        return off

    def fold(i: Column) -> Column:
        base = in_base(i)
        elems = F.transform(
            F.sequence(F.lit(0), F.lit(n_red - 1)),
            lambda j: F.element_at(arr, (base + red_offset(j) + 1).cast("int")),
        )
        if reduction == "sum":
            return F.aggregate(elems, F.lit(0.0), lambda acc, x: acc + x)
        if reduction == "mean":
            return F.aggregate(elems, F.lit(0.0), lambda acc, x: acc + x) / F.lit(float(n_red))
        if reduction == "max":
            return F.array_max(elems)
        return F.array_min(elems)

    return F.transform(out_idx, fold)


def einops_apply(
    df: DataFrame,
    key: str,
    pattern: str,
    mode: str = "rearrange",
    sizes: dict[str, int] | None = None,
    in_len: int | None = None,
    reduction: str = "mean",
) -> DataFrame:
    """Mapper form (reference M6): replace column ``key`` with the pattern's
    result, leaving every other column untouched."""
    return df.withColumn(
        key, einops_expr(F.col(key), pattern, mode, sizes, in_len, reduction)
    )
