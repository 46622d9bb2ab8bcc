"""Pure-Python PNG codec (operators/pngcodec.py): lossless round-trips must
be EXACT; all five filter types exercised via the encoder's forward filters."""

import numpy as np
import pytest

from datapipelines_spark.operators.pngcodec import decode_png, encode_png


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_rgb_roundtrip_exact_every_filter(filter_type):
    rng = np.random.default_rng(filter_type)
    img = rng.integers(0, 256, (13, 17, 3), np.uint8)
    dec = decode_png(encode_png(img, filter_type=filter_type))
    assert np.array_equal(dec, img)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_all_color_types_roundtrip(channels):
    rng = np.random.default_rng(channels)
    img = rng.integers(0, 256, (9, 7, channels), np.uint8)
    dec = decode_png(encode_png(img, filter_type=4))
    assert np.array_equal(dec, img)


def test_grayscale_2d_input():
    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256
    dec = decode_png(encode_png(img))
    assert np.array_equal(dec[:, :, 0], img)


def test_one_pixel_wide_edge_case():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (5, 1, 3), np.uint8)
    for ft in range(5):
        assert np.array_equal(decode_png(encode_png(img, filter_type=ft)), img)


def test_not_png_and_truncated_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\xff\xd8 not a png")
    rng = np.random.default_rng(1)
    enc = encode_png(rng.integers(0, 256, (8, 8, 3), np.uint8))
    with pytest.raises(ValueError):
        decode_png(enc[: len(enc) // 2])


@pytest.mark.parametrize("shape", [(16, 16, 3), (13, 9, 3), (7, 7, 1), (3, 3, 4), (1, 1, 3), (2, 9, 3)])
def test_adam7_interlaced_roundtrip_exact(shape):
    """Adam7: seven independently-filtered passes reassemble exactly,
    including sizes where some passes are empty."""
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, np.uint8)
    for ft in (0, 2, 4):
        assert np.array_equal(
            decode_png(encode_png(img, filter_type=ft, interlace=True)), img
        )


def test_16bit_decodes_to_high_byte():
    rng = np.random.default_rng(16)
    img8 = rng.integers(0, 256, (11, 13, 3), np.uint8)
    img16 = (img8.astype(np.uint16) << 8) | img8  # v*257: high byte == v
    dec = decode_png(encode_png(img16, filter_type=4))
    assert np.array_equal(dec, img8)
    dec_i = decode_png(encode_png(img16, filter_type=2, interlace=True))
    assert np.array_equal(dec_i, img8)


def test_router_decodes_png_payloads():
    from datapipelines_spark.operators.multimodal import real_decode

    img = np.full((12, 10, 3), 133, np.uint8)
    feats = real_decode(encode_png(img, filter_type=2))
    assert (feats["width"], feats["height"], feats["n_channels"]) == (10, 12, 3)
    assert abs(feats["mean_pixel"] * 255.0 - 133) < 1e-9  # lossless


def test_pil_decoder_spec_handles_png_members(spark):
    import pandas as pd

    from datapipelines_spark.operators.decode import apply_decoder
    from datapipelines_spark.operators.multimodal import decode_ppm

    img = np.full((5, 6, 3), 64, np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame({"__key__": ["a"], "png": [encode_png(img)]})
    )
    out = apply_decoder(df, "pil").collect()[0]
    assert np.array_equal(decode_ppm(bytes(out["png"])), img)


# --- property tests --------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ch=st.sampled_from([1, 3, 4]),
    ft=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_exact_property(h, w, ch, ft, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, ch), np.uint8)
    assert np.array_equal(decode_png(encode_png(img, filter_type=ft)), img)


@settings(max_examples=20, deadline=None)
@given(st.binary(min_size=0, max_size=150))
def test_garbage_raises_valueerror(data):
    from hypothesis import assume

    assume(not data.startswith(b"\x89PNG\r\n\x1a\n"))
    with pytest.raises(ValueError):
        decode_png(data)


def test_palette_color_type_decodes_to_rgb():
    """Hand-built color-type-3 PNG (the encoder never emits palettes):
    2x2 image indexing a 3-entry palette."""
    import struct
    import zlib

    from datapipelines_spark.operators.pngcodec import _chunk

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    rows = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 0])  # filter 0 rows
    idat = zlib.compress(rows)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
    arr = decode_png(data)
    assert arr.shape == (2, 2, 3)
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[0, 1].tolist() == [0, 255, 0]
    assert arr[1, 0].tolist() == [0, 0, 255]
    assert arr[1, 1].tolist() == [255, 0, 0]
