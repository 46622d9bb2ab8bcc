"""Join operators: the reference's metadata-join family (J2/J3/J4) plus
general helpers.

Reference semantics (SURVEY §2.2): metadata shards are equi-joined to main
samples on a derived key; mains with no matching meta are dropped via a
semi-join pre-filter (datapipeline.py:400-404); on column collision the meta
column is renamed with a suffix (merge_samples, datapipeline.py:225-245).

Physical guidance: metadata sides are usually small → broadcast by default;
for meta tables too big to broadcast, the equi-join shuffles on the key both
sides — pre-bucket both tables on the key in a production layout to make it
shuffle-free.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def semi_filter(main: DataFrame, meta: DataFrame, on: str) -> DataFrame:
    """J3 parity: keep main rows that have metadata (left-semi join)."""
    return main.join(meta.select(on), on, "left_semi")


def anti_filter(main: DataFrame, meta: DataFrame, on: str) -> DataFrame:
    """Complement of semi_filter — main rows lacking metadata."""
    return main.join(meta.select(on), on, "left_anti")


def metadata_join(
    main: DataFrame,
    meta: DataFrame,
    on: str,
    how: str = "inner",
    collision_suffix: str = "_meta",
    broadcast_meta: bool = True,
) -> DataFrame:
    """J2/J4 parity: equi-join meta onto main, renaming colliding meta
    columns with ``collision_suffix`` (the reference suffixes the meta key,
    merge_samples at datapipeline.py:236-242)."""
    collisions = (set(main.columns) & set(meta.columns)) - {on}
    for c in collisions:
        meta = meta.withColumnRenamed(c, f"{c}{collision_suffix}")
    right = F.broadcast(meta) if broadcast_meta else meta
    return main.join(right, on, how)
