"""Config → DataFrame pipeline builder (reference G1-G5 parity).

The reference's "query language" is YAML with ``{target: "pkg.mod.Cls",
params: {...}}`` nodes resolved by reflection and folded onto a datapipe
(`instantiate` at /root/reference/sdata/datapipeline.py:123-130;
`create_dataset` at /root/reference/sdata/dataset.py:124-256). Here the same
config shape builds a *DataFrame*: sources resolve to scans, preprocessors /
postprocessors resolve to registered operator factories that each map
``DataFrame -> DataFrame``, so the whole config compiles to one lazy Catalyst
plan — filters written as config entries still reach the parquet scan as
pushed predicates.

Config shape (compatible with examples/configs/example.yaml:1-31):

    dataset:
      urls: /root/testdata/sf0.001            # dir of parquet, a table path,
      table: documents                        #   or tar shards / brace spec
      format: parquet | tar
      pipeline_config:
        shardshuffle: 10000        # accepted for parity; seeded shuffle
        sample_shuffle: 1          # >1 -> deterministic hash shuffle
      decoders: [...]              # per-column decode specs (see decode.py)
      preprocessors:               # filters/mappers, applied in order
        - target: datapipelines_spark.operators.transforms.KeyFilter
          params: {keys: [text]}
      postprocessors: [...]
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def create_obj(path: str) -> Any:
    """Resolve a dotted import path to an object."""
    module, _, name = path.rpartition(".")
    if not module:
        raise ValueError(f"target {path!r} must be a dotted path")
    return getattr(importlib.import_module(module), name)


def instantiate(node: Any) -> Any:
    """``{"target": ..., "params": {...}}`` → instance; passthrough otherwise."""
    if isinstance(node, dict) and "target" in node:
        cls = create_obj(node["target"])
        return cls(**node.get("params", {}))
    return node


def make_callable(node: Any) -> Callable:
    if isinstance(node, dict) and "target" in node:
        import functools

        return functools.partial(create_obj(node["target"]), **node.get("params", {}))
    if callable(node):
        return node
    raise TypeError(f"cannot make a callable from {node!r}")


def _load_source(spark: SparkSession, dataset_cfg: dict) -> DataFrame:
    fmt = dataset_cfg.get("format", "parquet")
    urls = dataset_cfg["urls"]
    if fmt == "tar":
        from datapipelines_spark.sources.shards import read_tar_samples

        return read_tar_samples(
            spark,
            urls,
            is_braceexpand=dataset_cfg.get("is_braceexpand"),
            on_error=dataset_cfg.get("on_error", "fail"),
        )
    if fmt == "parquet":
        table = dataset_cfg.get("table")
        if table:
            from datapipelines_spark.sources.parquet import load_table

            return load_table(spark, urls, table)
        return spark.read.parquet(*(urls if isinstance(urls, list) else [urls]))
    raise ValueError(f"unknown source format {fmt!r}")


def _apply_stage(df: DataFrame, stage: Any) -> DataFrame:
    """A stage is anything exposing ``apply(df) -> DataFrame`` (operator
    classes from the registry) or a bare callable ``df -> df``."""
    op = instantiate(stage)
    if hasattr(op, "apply"):
        return op.apply(df)
    if callable(op):
        return op(df)
    raise TypeError(f"pipeline stage {stage!r} is neither operator nor callable")


def create_dataset(spark: SparkSession, config: dict) -> DataFrame:
    """Compile a config dict to a lazy DataFrame (reference ``create_dataset``).

    Stage order is preserved exactly as configured (the reference applies
    preprocessors → decoders → postprocessors in config order,
    dataset.py:182-254) — but because every stage emits declarative
    DataFrame ops, Catalyst is then free to reorder/push/prune, which the
    reference could never do.
    """
    dataset_cfg = config.get("dataset", config)
    df = _load_source(spark, dataset_cfg)

    pipeline_cfg = dataset_cfg.get("pipeline_config", {}) or {}
    sample_shuffle = int(pipeline_cfg.get("sample_shuffle", 1) or 1)
    seed = pipeline_cfg.get("seed", 42)

    for stage in dataset_cfg.get("preprocessors", []) or []:
        df = _apply_stage(df, stage)

    for spec in dataset_cfg.get("decoders", []) or []:
        from datapipelines_spark.operators.decode import apply_decoder

        df = apply_decoder(df, spec)

    for stage in dataset_cfg.get("postprocessors", []) or []:
        df = _apply_stage(df, stage)

    if sample_shuffle > 1:
        from datapipelines_spark.operators.mixing import deterministic_shuffle

        df = deterministic_shuffle(df, seed=seed)
    return df
