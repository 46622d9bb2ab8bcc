"""M4 real-codec path: decode ACTUAL image bytes (PPM/PGM/BMP, pure numpy)
through the Arrow-batched decode stage — not the digest fake (VERDICT r2 #5).
Includes the reference-parity decode→transform chain
(/root/reference/sdata/mappers/sample_mappers.py:88-123) on real pixels."""

import struct

import numpy as np
import pytest

from datapipelines_spark.operators.multimodal import (
    decode_array,
    decode_bmp,
    decode_images,
    decode_ppm,
    real_decode,
)


def _ppm_bytes(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def _pgm_bytes(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    return f"P5\n{w} {h}\n255\n".encode() + arr.tobytes()


def _bmp_bytes(arr: np.ndarray) -> bytes:
    """Uncompressed 24-bit bottom-up BMP with 4-byte row padding."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    raster = b"".join(
        row[:, [2, 1, 0]].tobytes() + b"\x00" * (stride - w * 3) for row in arr[::-1]
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return b"BM" + struct.pack("<IHHI", 14 + 40 + len(raster), 0, 0, 54) + info + raster


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(42)
    return {
        "ppm": rng.integers(0, 256, (7, 11, 3), dtype=np.uint8),
        "pgm": rng.integers(0, 256, (5, 8), dtype=np.uint8),
        "bmp": rng.integers(0, 256, (6, 5, 3), dtype=np.uint8),
    }


def test_codec_roundtrips(images):
    assert np.array_equal(decode_ppm(_ppm_bytes(images["ppm"])), images["ppm"])
    assert np.array_equal(decode_ppm(_pgm_bytes(images["pgm"])), images["pgm"])
    assert np.array_equal(decode_bmp(_bmp_bytes(images["bmp"])), images["bmp"])
    # magic-byte routing picks the right decoder
    assert decode_array(_bmp_bytes(images["bmp"])).shape == (6, 5, 3)


def test_decode_images_on_real_bytes(spark, images):
    rows = [
        ("ppm", bytearray(_ppm_bytes(images["ppm"]))),
        ("pgm", bytearray(_pgm_bytes(images["pgm"]))),
        ("bmp", bytearray(_bmp_bytes(images["bmp"]))),
    ]
    df = spark.createDataFrame(rows, "`__key__` string, jpg binary")
    out = {
        r["__key__"]: r
        for r in decode_images(df, decode_fn=real_decode, timeout_s=10.0).collect()
    }
    assert (out["ppm"]["width"], out["ppm"]["height"], out["ppm"]["n_channels"]) == (11, 7, 3)
    assert (out["pgm"]["width"], out["pgm"]["height"], out["pgm"]["n_channels"]) == (8, 5, 1)
    assert (out["bmp"]["width"], out["bmp"]["height"], out["bmp"]["n_channels"]) == (5, 6, 3)
    for name, arr in images.items():
        assert out[name]["decode_error"] is None
        assert abs(out[name]["mean_pixel"] - arr.mean() / 255.0) < 1e-12


def test_decode_images_quarantines_corrupt_real_bytes(spark, images):
    good = _ppm_bytes(images["ppm"])
    rows = [
        ("good", bytearray(good)),
        ("truncated", bytearray(good[: len(good) // 2])),
        ("not_an_image", bytearray(b"\x89PNG not really")),
    ]
    df = spark.createDataFrame(rows, "`__key__` string, jpg binary")
    out = {r["__key__"]: r for r in decode_images(df, decode_fn=real_decode).collect()}
    assert out["good"]["decode_error"] is None
    assert "truncated" in out["truncated"]["decode_error"]
    assert out["not_an_image"]["decode_error"] is not None
    assert out["truncated"]["width"] is None


def test_decode_then_transform_chain(images):
    """Reference decode→crop chain (sample_mappers.py:88-123) on real
    pixels: decode PPM, deterministic center square crop, downscale 2x by
    striding — all numpy, matching the M5 crop semantics."""
    arr = decode_array(_ppm_bytes(images["ppm"]))  # (7, 11, 3)
    side = min(arr.shape[:2])
    top = (arr.shape[0] - side) // 2
    left = (arr.shape[1] - side) // 2
    crop = arr[top : top + side, left : left + side]
    assert crop.shape == (7, 7, 3)
    small = crop[::2, ::2]
    assert small.shape == (4, 4, 3)
    assert np.array_equal(small, images["ppm"][0:7, 2:9][::2, ::2])


def test_binary_file_source_feeds_real_decode(spark, tmp_path, images):
    """Loose-file ingestion (sources/binary.py) -> decode_images with the
    real codec: the non-tar corpus shape, end-to-end on actual bytes."""
    from datapipelines_spark.sources.binary import read_binary_files

    (tmp_path / "a.ppm").write_bytes(_ppm_bytes(images["ppm"]))
    (tmp_path / "b.pgm").write_bytes(_pgm_bytes(images["pgm"]))
    (tmp_path / "skip.txt").write_bytes(b"not an image")

    files = read_binary_files(spark, str(tmp_path), glob="*.p?m")
    assert {r["__key__"] for r in files.select("__key__").collect()} == {"a", "b"}

    out = {
        r["__key__"]: r
        for r in decode_images(
            files, payload_col="payload", decode_fn=real_decode
        ).collect()
    }
    assert (out["a"]["width"], out["a"]["height"]) == (11, 7)
    assert (out["b"]["width"], out["b"]["height"], out["b"]["n_channels"]) == (8, 5, 1)
    assert all(r["decode_error"] is None for r in out.values())
