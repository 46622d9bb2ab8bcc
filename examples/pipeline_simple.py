"""Minimal end-to-end usage, mirroring the reference's example
(/root/reference/examples/image_simple.py): YAML config -> dataset ->
batched loader -> consume.

Run:  python examples/pipeline_simple.py [config.yaml]
"""

from __future__ import annotations

import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelines_spark import create_dataset, create_loader, get_spark


def main() -> None:
    cfg_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "config_documents.yaml"
    )
    with open(cfg_path) as fh:
        config = yaml.safe_load(fh)

    spark = get_spark(app_name="example", master="local[4]", shuffle_partitions=4)
    df = create_dataset(spark, config)
    print(f"dataset schema: {df.schema.simpleString()}")

    loader_cfg = config.get("loader", {})
    n_batches = 0
    n_rows = 0
    for batch in create_loader(
        df,
        batch_size=int(loader_cfg.get("batch_size", 256)),
        partial=bool(loader_cfg.get("partial", True)),
    ):
        n_batches += 1
        n_rows += len(batch["doc_id"])
        if n_batches == 1:
            print(f"first batch keys: {sorted(batch)}; rows: {len(batch['doc_id'])}")
    print(f"consumed {n_rows} rows in {n_batches} batches")
    spark.stop()


if __name__ == "__main__":
    main()
