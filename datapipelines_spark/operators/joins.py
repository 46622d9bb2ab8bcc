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


def fuzzy_join(
    a: DataFrame,
    b: DataFrame,
    col_a: str,
    col_b: str,
    max_distance: int = 2,
) -> DataFrame:
    """Edit-distance join (entity resolution) WITHOUT the cross product.

    Sound two-stage plan:
    1. Length-band blocking: levenshtein(x, y) <= d implies
       |len(x) - len(y)| <= d, so side B is exploded to its d+1+d candidate
       lengths and equi-joined against side A's length — every true match
       survives (zero recall loss), and the candidate volume drops by the
       length-distribution spread instead of being |A| x |B|.
    2. Exact levenshtein filter on the candidates (codegen'd JVM
       expression).

    Returns a joined frame with a ``distance`` column. At 100 TB add a
    domain blocking key (e.g. country, category) to the equi-join — the
    API composes: fuzzy_join(a.withColumn(...), ...) on pre-blocked
    partitions.
    """
    if max_distance < 0:
        raise ValueError("max_distance must be >= 0")
    left = a.withColumn("__len_a", F.length(F.col(col_a)))
    right = b.withColumn(
        "__len_b",
        F.explode(
            F.sequence(
                F.length(F.col(col_b)) - max_distance,
                F.length(F.col(col_b)) + max_distance,
            )
        ),
    )
    joined = left.join(right, left["__len_a"] == right["__len_b"])
    dist = F.levenshtein(F.col(col_a), F.col(col_b))
    return (
        joined.withColumn("distance", dist)
        .where(F.col("distance") <= max_distance)
        .drop("__len_a", "__len_b")
    )
