"""The reference's flagship image flow (examples/image_simple.py), fully
REAL on this engine: synthesize JPEGs with the in-repo T.81 encoder, write
WebDataset tar shards, read them back as samples, run the decode -> square
crop -> resize pixel chain (pure-numpy codecs, Arrow-batched), and consume
collated dict-of-numpy batches from the loader sink — zero third-party
image/torch libraries end-to-end.

Run:  python examples/image_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from datapipelines_spark import create_loader, get_spark  # noqa: E402
from datapipelines_spark.operators.imageops import crop_resize_images  # noqa: E402
from datapipelines_spark.operators.jpegcodec import encode_jpeg  # noqa: E402
from datapipelines_spark.sinks.writer import write_tar_shards  # noqa: E402
from datapipelines_spark.sources.shards import read_tar_samples  # noqa: E402


def main(n_images: int = 64, target: int = 32) -> None:
    spark = get_spark(app_name="image-example", master="local[4]", shuffle_partitions=4)

    # 1) synthesize jpg payloads (stand-in for a crawl) and shard them as tar
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n_images):
        h, w = int(rng.integers(40, 80)), int(rng.integers(40, 80))
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(yy * 2 + i) % 256, (xx * 3) % 256, (yy + xx) % 256], axis=-1
        ).astype(np.uint8)
        rows.append((f"{i:08d}", {"jpg": encode_jpeg(img, quality=85)}))
    samples = spark.createDataFrame(rows, "`__key__` string, data map<string, binary>")
    shard_dir = os.path.join(tempfile.gettempdir(), "image_pipeline_shards")
    summary = write_tar_shards(samples, shard_dir, shard_rows=16, mode="overwrite")
    print(f"wrote {len(summary)} tar shards: {summary}")

    # 2) read shards back as samples and run the real pixel chain
    ds = read_tar_samples(spark, shard_dir)
    imgs = ds.select("__key__", F.element_at("data", "jpg").alias("jpg"))
    transformed = crop_resize_images(imgs, target=target, on_error="fail")

    # 3) consume collated batches (dict of numpy columns)
    n_batches = 0
    for batch in create_loader(
        transformed.select("__key__", "width", "height", "mean_pixel", "ppm"),
        batch_size=16,
    ):
        n_batches += 1
        if n_batches == 1:
            print(f"batch keys: {sorted(batch)}")
            print(f"mean_pixel[:4] = {np.round(batch['mean_pixel'][:4], 4)}")
            print(f"payload sizes[:4] = {[len(p) for p in batch['ppm'][:4]]}")
    print(f"consumed {n_batches} batches of {target}x{target} crops")
    spark.stop()


if __name__ == "__main__":
    main()
