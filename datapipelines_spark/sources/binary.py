"""Loose-file binary ingestion: directories of media files -> binary rows.

The tar path (sources/shards.py) covers the reference's sharded layout;
this covers the other common corpus shape — millions of loose image/audio
files — via Spark's built-in ``binaryFile`` source, which scans
distributed, prunes on ``pathGlobFilter``, and never materializes a file
on the driver. Rows feed the multimodal decode stages directly
(operators/multimodal.py): ``content`` is the opaque BinaryType payload,
``__key__`` is the file stem, matching the tar reader's sample convention
(SURVEY §1.1 system columns).

At 100 TB the caveat is file-listing cost, not data volume: prefer
compacting loose files into parquet (payload as binary column) or tar
shards (sinks/writer.py:write_tar_shards) once, then scanning those.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """(``__key__``, ``__url__``, ``payload``, ``length``, ``mod_time``) per
    file under ``path`` (optionally filtered by ``glob``, e.g. ``*.ppm``)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path)
    stem = F.regexp_extract(F.reverse(F.split(F.col("path"), "/"))[0], r"^(.*?)(\.[^.]*)?$", 1)
    return raw.select(
        stem.alias("__key__"),
        F.col("path").alias("__url__"),
        F.col("content").alias("payload"),
        F.col("length"),
        F.col("modificationTime").alias("mod_time"),
    )
