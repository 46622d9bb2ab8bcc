"""Image-geometry sample mapper (M5 parity).

Reference: ``AddOriginalImageSizeAsTupleAndCropToSquare``
(/root/reference/sdata/mappers/sample_mappers.py:127-177) reads height/width
from the sample's JSON member, records ``original_size_as_tuple``, picks a
random square crop (`np.random.randint` top/left), and records
``crop_coords_top_left``.

Here the geometry is computed as columns, and the "random" offsets derive
from the sample key (portable seeded hash) instead of RNG state — the same
crop is chosen on retry, across executors, and in the oracle
(SURVEY §7.6 risk 2). The pixel slice itself belongs to the multimodal UDF
stage (multimodal.py); this operator produces the coordinates it consumes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datapipelines_spark.functions.hashing import portable_hash_seeded


def add_size_and_square_crop(
    df: DataFrame,
    height_col: str,
    width_col: str,
    key_col: str = "__key__",
    seed: int | str = 42,
) -> DataFrame:
    """Append original_height/original_width/crop_size/crop_top/crop_left.

    crop_size = min(h, w); offsets are deterministic in [0, dim - crop_size]
    via hash(key) — uniform-ish, reproducible, engine-portable.
    """
    h = F.col(height_col).cast("long")
    w = F.col(width_col).cast("long")
    crop = F.least(h, w)
    top_range = h - crop + 1
    left_range = w - crop + 1
    top = portable_hash_seeded(F.col(key_col), f"{seed}-top") % top_range
    left = portable_hash_seeded(F.col(key_col), f"{seed}-left") % left_range
    return (
        df.withColumn("original_height", h)
        .withColumn("original_width", w)
        .withColumn("crop_size", crop)
        .withColumn("crop_top", top)
        .withColumn("crop_left", left)
    )
