"""datapipelines_spark — a PySpark-native analytics & training-data engine.

A ground-up re-expression of the capabilities of Stability-AI/datapipelines
(`sdata`, a WebDataset/torchdata iterable-pipeline library — see SURVEY.md) as
idiomatic Spark DataFrame / SQL / Structured Streaming, extended with the
relational surface and LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) that a 100 TB training-data pipeline needs.

Public entry points (mirroring the reference's two-call API,
/root/reference/sdata/dataset.py:124 `create_dataset` and :51 `create_loader`):

    from datapipelines_spark import create_dataset, create_loader, get_spark

    spark = get_spark()
    df = create_dataset(spark, config)          # config -> DataFrame (lazy plan)
    for batch in create_loader(df, batch_size=256):   # dict-of-numpy batches
        ...

Everything is DataFrame-first: operators take and return DataFrames so
Catalyst owns optimization (pushdown, pruning, join selection, AQE).
"""

from datapipelines_spark.session import get_spark, stop_spark
from datapipelines_spark.plans.pipeline import create_dataset
from datapipelines_spark.sinks.loader import create_loader

__all__ = ["get_spark", "stop_spark", "create_dataset", "create_loader"]

__version__ = "0.1.0"
