"""Dataset writers: the ETL sink side (the reference only ever sinks into a
torch DataLoader; a Spark-native engine also needs durable, re-readable
outputs).

``write_dataset`` targets the 100 TB posture directly:
- partition-by columns for downstream partition pruning,
- file sizing via a pre-write repartition (~target_rows per file) so output
  is neither a million tiny files nor ten huge ones,
- sorted-within-files option so downstream scan filters benefit from parquet
  min/max row-group statistics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_dataset(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    target_files: int | None = None,
    sort_within_by: Sequence[str] = (),
    mode: str = "error",
    format: str = "parquet",
) -> None:
    out = df
    if target_files:
        if partition_by:
            # co-locate each output partition's rows, capping file count
            out = out.repartition(target_files, *[out[c] for c in partition_by])
        else:
            out = out.repartition(target_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    writer = out.write.mode(mode).format(format)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    path: str | None = None,
    sort_by: Sequence[str] | None = None,
    mode: str = "error",
) -> None:
    """Persist as a bucketed (and optionally sorted) table.

    The production layout for fact-fact joins: two tables bucketed on the
    same key with the same bucket count join with NO exchange on either side
    (Spark trusts the on-disk hash partitioning) — at 100 TB that removes
    the dominant shuffle from every lineitem⋈orders-shaped query. Bucketed
    writes must go through the catalog (saveAsTable), hence the table name.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_sample_shards(
    df: DataFrame,
    path: str,
    shard_rows: int = 10_000,
    mode: str = "error",
) -> None:
    """WebDataset-style sharding for the sample table: fixed-ish rows per
    output file (the parquet equivalent of the reference's N-samples-per-tar
    layout)."""
    n_rows = df.count()
    n_files = max(1, (n_rows + shard_rows - 1) // shard_rows)
    df.repartition(n_files).write.mode(mode).parquet(path)
