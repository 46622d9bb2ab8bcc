"""Reference-YAML migration parity: the example.yaml shape from
/root/reference/examples/configs/example.yaml runs end-to-end on this
engine — tar shards of jpgs, "pil" decoder spec, config-targeted image
transform stage, batched loader — with every pixel stage real."""

import numpy as np
import pytest

from datapipelines_spark.operators.jpegcodec import encode_jpeg


@pytest.fixture(scope="module")
def jpg_shard_dir(spark, tmp_path_factory):
    from datapipelines_spark.sinks.writer import write_tar_shards

    base = tmp_path_factory.mktemp("cfgshards")
    rows = []
    for i in range(24):
        h, w = 20 + (i % 3) * 12, 20 + (i % 4) * 12
        img = np.full((h, w, 3), (i * 11) % 200 + 20, np.uint8)
        rows.append(
            (
                f"{i:08d}",
                {
                    "jpg": encode_jpeg(img, quality=90),
                    "txt": f"caption {i}".encode(),
                },
            )
        )
    samples = spark.createDataFrame(rows, "`__key__` string, data map<string, binary>")
    out = str(base / "shards")
    write_tar_shards(samples, out, shard_rows=8, mode="overwrite")
    return out


def test_reference_yaml_shape_end_to_end(spark, jpg_shard_dir):
    from datapipelines_spark.plans.pipeline import create_dataset
    from datapipelines_spark.sinks.loader import create_loader

    config = {
        "dataset": {
            "urls": jpg_shard_dir,
            "format": "tar",
            "pipeline_config": {"sample_shuffle": 1000, "seed": 7},
            "preprocessors": [
                {
                    "target": "datapipelines_spark.operators.fluent.PromoteMembers",
                    "params": {"keys": ["jpg", "txt"]},
                },
            ],
            "decoders": ["pil", {"key": "txt", "decoder": "utf8"}],
            "postprocessors": [
                {
                    "target": "datapipelines_spark.operators.imageops.ImageTransforms",
                    "params": {"key": "jpg", "size": 16, "interpolation": "bilinear"},
                },
            ],
        },
        "loader": {"batch_size": 8},
    }
    df = create_dataset(spark, config)
    cols = set(df.columns)
    assert {"__key__", "txt", "ppm", "crop_top", "crop_left", "width"} <= cols

    n_rows = 0
    for batch in create_loader(df, batch_size=8):
        n_rows += len(batch["__key__"])
        assert set(batch) >= {"__key__", "txt", "ppm", "width", "mean_pixel"}
        for k, txt, ppm, wv in zip(
            batch["__key__"], batch["txt"], batch["ppm"], batch["width"]
        ):
            i = int(k)
            assert txt == f"caption {i}"
            assert wv == 16
            # the transformed payload is canonical P6 of the 16x16 crop
            assert bytes(ppm).startswith(b"P6\n16 16\n255\n")
    assert n_rows == 24


def test_pil_decoder_spec_decodes_only_image_columns(spark):
    import pandas as pd

    from datapipelines_spark.operators.decode import apply_decoder
    from datapipelines_spark.operators.multimodal import decode_ppm

    img = np.full((6, 5, 3), 77, np.uint8)
    pdf = pd.DataFrame(
        {
            "__key__": ["a"],
            "jpg": [encode_jpeg(img, quality=95)],
            "bin": [b"\x00\x01\x02"],  # non-image binary must pass through
        }
    )
    df = spark.createDataFrame(pdf)
    out = apply_decoder(df, "pil").collect()[0]
    arr = decode_ppm(bytes(out["jpg"]))
    assert arr.shape == (6, 5, 3)
    assert abs(float(arr.mean()) - 77) < 2.0
    assert bytes(out["bin"]) == b"\x00\x01\x02"


def test_promote_members_expands_map(spark):
    from datapipelines_spark.operators.fluent import PromoteMembers

    df = spark.createDataFrame(
        [("k1", {"jpg": b"\xff\xd8x", "txt": b"hello"})],
        "`__key__` string, data map<string, binary>",
    )
    out = PromoteMembers(keys=["jpg", "txt"]).apply(df)
    row = out.collect()[0]
    assert bytes(row["txt"]) == b"hello"
    assert "data" not in out.columns
