from datapipelines_spark.sources.parquet import TABLES, load_table, load_tables, register_views
from datapipelines_spark.sources.shards import shard_expand, list_shards

__all__ = ["TABLES", "load_table", "load_tables", "register_views", "shard_expand", "list_shards"]
