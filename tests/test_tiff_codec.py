"""Baseline TIFF codec (operators/tiffcodec.py): encoder-fixture round-trips
over both byte orders and compressions, plus hand-assembled goldens
(multi-strip, 16-bit, WhiteIsZero) independent of the repo's encoder."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelines_spark.operators.tiffcodec import decode_tiff, encode_tiff


@pytest.mark.parametrize("packbits", [False, True])
@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("shape", [(17, 23), (17, 23, 3), (8, 8, 4)])
def test_roundtrip(shape, packbits, big_endian):
    img = np.random.default_rng(5).integers(0, 256, shape).astype(np.uint8)
    out = decode_tiff(encode_tiff(img, packbits=packbits, big_endian=big_endian))
    want = img if img.ndim == 3 else img[..., None]
    assert np.array_equal(out, want)


def test_packbits_compresses_runs():
    rep = np.full((64, 64), 7, dtype=np.uint8)
    assert len(encode_tiff(rep, packbits=True)) < len(encode_tiff(rep))


def test_multimodal_router_decodes_tiff():
    from datapipelines_spark.operators.multimodal import decode_array

    img = np.random.default_rng(9).integers(0, 256, (6, 7, 3)).astype(np.uint8)
    assert np.array_equal(decode_array(encode_tiff(img)), img)


@pytest.mark.parametrize(
    "payload", [b"", b"II*", b"XX\x00*" + b"\x00" * 8, b"II*\x00\xff\xff\xff\xff"]
)
def test_garbage_rejected(payload):
    with pytest.raises(ValueError):
        decode_tiff(payload)


def test_unsupported_compression_named_error():
    img = np.zeros((2, 2), dtype=np.uint8)
    data = bytearray(encode_tiff(img))
    # rewrite the Compression tag value (SHORT, little-endian) to 7 = JPEG
    ifd_off = struct.unpack("<I", data[4:8])[0]
    n = struct.unpack("<H", data[ifd_off:ifd_off + 2])[0]
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag = struct.unpack("<H", data[base:base + 2])[0]
        if tag == 259:
            data[base + 8:base + 10] = struct.pack("<H", 7)
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(data))


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    c=st.sampled_from([1, 3]),
    pb=st.booleans(),
    be=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_property(h, w, c, pb, be, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w) if c == 1 else (h, w, c)).astype(np.uint8)
    out = decode_tiff(encode_tiff(img, packbits=pb, big_endian=be))
    want = img if img.ndim == 3 else img[..., None]
    assert np.array_equal(out, want)


# --- goldens: hand-assembled per TIFF 6.0, independent of encode_tiff --------


def _golden_two_strip_gray() -> bytes:
    """3x4 grayscale, TWO strips (2+2 rows), uncompressed, little-endian.
    Pixel value = 10*row + col."""
    strip1 = bytes([0, 1, 2, 10, 11, 12])       # rows 0-1
    strip2 = bytes([20, 21, 22, 30, 31, 32])    # rows 2-3
    raster_off = 8
    ifd_off = raster_off + len(strip1) + len(strip2)
    out = bytearray(b"II*\x00") + struct.pack("<I", ifd_off)
    out += strip1 + strip2
    entries = [
        (256, 4, 1, struct.pack("<I", 3)),            # width
        (257, 4, 1, struct.pack("<I", 4)),            # height
        (258, 3, 1, struct.pack("<HH", 8, 0)),        # bits per sample
        (259, 3, 1, struct.pack("<HH", 1, 0)),        # no compression
        (262, 3, 1, struct.pack("<HH", 1, 0)),        # BlackIsZero
        (273, 4, 2, struct.pack("<I", ifd_off + 2 + 12 * 9 + 4)),  # offsets arr
        (277, 3, 1, struct.pack("<HH", 1, 0)),        # samples per pixel
        (278, 4, 1, struct.pack("<I", 2)),            # rows per strip
        (279, 4, 2, struct.pack("<I", ifd_off + 2 + 12 * 9 + 4 + 8)),  # counts
    ]
    out += struct.pack("<H", len(entries))
    for tag, ttype, count, val in entries:
        out += struct.pack("<HHI", tag, ttype, count) + val
    out += struct.pack("<I", 0)
    out += struct.pack("<II", raster_off, raster_off + len(strip1))  # offsets
    out += struct.pack("<II", len(strip1), len(strip2))              # counts
    return bytes(out)


def test_golden_two_strip_gray():
    img = decode_tiff(_golden_two_strip_gray())
    expect = np.array(
        [[0, 1, 2], [10, 11, 12], [20, 21, 22], [30, 31, 32]], dtype=np.uint8
    )[..., None]
    assert np.array_equal(img, expect)


def _golden_16bit_whitezero_be() -> bytes:
    """1x2 grayscale, 16-bit big-endian samples, WhiteIsZero photometric.
    Samples 0xAB12, 0x0034 -> high bytes 0xAB, 0x00 -> inverted 0x54, 0xFF."""
    raster = struct.pack(">HH", 0xAB12, 0x0034)
    ifd_off = 8 + len(raster)
    out = bytearray(b"MM\x00*") + struct.pack(">I", ifd_off)
    out += raster
    entries = [
        (256, 4, 1, struct.pack(">I", 2)),
        (257, 4, 1, struct.pack(">I", 1)),
        (258, 3, 1, struct.pack(">HH", 16, 0)),
        (259, 3, 1, struct.pack(">HH", 1, 0)),
        (262, 3, 1, struct.pack(">HH", 0, 0)),       # WhiteIsZero
        (273, 4, 1, struct.pack(">I", 8)),
        (277, 3, 1, struct.pack(">HH", 1, 0)),
        (278, 4, 1, struct.pack(">I", 1)),
        (279, 4, 1, struct.pack(">I", len(raster))),
    ]
    out += struct.pack(">H", len(entries))
    for tag, ttype, count, val in entries:
        out += struct.pack(">HHI", tag, ttype, count) + val
    out += struct.pack(">I", 0)
    return bytes(out)


def test_golden_16bit_whitezero_bigendian():
    img = decode_tiff(_golden_16bit_whitezero_be())
    assert np.array_equal(img, np.array([[[0x54], [0xFF]]], dtype=np.uint8))


def test_golden_packbits_strip():
    """2x4 gray, PackBits: row0 = run of 4 zeros (257-4=0xFD then 0x00),
    row1 = literal 1,2,3,4 (count-1=0x03 then the bytes), one strip."""
    strip = bytes([0xFD, 0x00, 0x03, 1, 2, 3, 4])
    ifd_off = 8 + len(strip)
    out = bytearray(b"II*\x00") + struct.pack("<I", ifd_off)
    out += strip
    entries = [
        (256, 4, 1, struct.pack("<I", 4)),
        (257, 4, 1, struct.pack("<I", 2)),
        (258, 3, 1, struct.pack("<HH", 8, 0)),
        (259, 3, 1, struct.pack("<HH", 32773, 0)),
        (262, 3, 1, struct.pack("<HH", 1, 0)),
        (273, 4, 1, struct.pack("<I", 8)),
        (277, 3, 1, struct.pack("<HH", 1, 0)),
        (278, 4, 1, struct.pack("<I", 2)),
        (279, 4, 1, struct.pack("<I", len(strip))),
    ]
    out += struct.pack("<H", len(entries))
    for tag, ttype, count, val in entries:
        out += struct.pack("<HHI", tag, ttype, count) + val
    out += struct.pack("<I", 0)
    img = decode_tiff(bytes(out))
    expect = np.array([[0, 0, 0, 0], [1, 2, 3, 4]], dtype=np.uint8)[..., None]
    assert np.array_equal(img, expect)


# --- LZW (compression 5) + horizontal predictor (tag 317) --------------------


@pytest.mark.parametrize("predictor", [False, True])
@pytest.mark.parametrize("big_endian", [False, True])
def test_lzw_roundtrip(predictor, big_endian):
    img = np.random.default_rng(11).integers(0, 256, (50, 60, 3)).astype(np.uint8)
    out = decode_tiff(
        encode_tiff(img, lzw=True, predictor=predictor, big_endian=big_endian)
    )
    assert np.array_equal(out, img)


def test_lzw_dictionary_reset_path():
    # 100k random bytes force >4093 dictionary entries -> Clear-code reset
    from datapipelines_spark.operators.tiffcodec import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    raw = np.random.default_rng(3).integers(0, 256, 100_000).astype(np.uint8).tobytes()
    assert _tiff_lzw_decode(_tiff_lzw_encode(raw), len(raw)) == raw


def test_predictor_improves_gradient_compression():
    grad = np.tile(np.arange(256, dtype=np.uint8), (64, 1))
    assert len(encode_tiff(grad, lzw=True, predictor=True)) < len(
        encode_tiff(grad, lzw=True)
    )
    assert np.array_equal(
        decode_tiff(encode_tiff(grad, lzw=True, predictor=True))[..., 0], grad
    )


def test_golden_lzw_code_sequence():
    """Hand-derived TIFF-LZW stream for samples [7,7,7,8] (spec §13 worked
    through by hand): codes Clear(256), 7, 258 (the just-created "7,7"
    entry — the KwKwK case), 8, EOI(257), all at 9 bits, MSB-first."""
    from datapipelines_spark.operators.tiffcodec import _tiff_lzw_decode

    codes = [256, 7, 258, 8, 257]
    acc, nbits, out = 0, 0, bytearray()
    for c in codes:  # mechanical MSB-first packing of the hand-derived codes
        acc = (acc << 9) | c
        nbits += 9
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    assert _tiff_lzw_decode(bytes(out), 4) == bytes([7, 7, 7, 8])


def test_both_compressions_rejected():
    with pytest.raises(ValueError, match="one compression"):
        encode_tiff(np.zeros((2, 2), dtype=np.uint8), packbits=True, lzw=True)


def test_roundtrip_gray_alpha_spp2_inlines_bits():
    """spp=2 BitsPerSample is 4 bytes and must be INLINE per spec — the
    offset form put the bits values out-of-line where conforming readers
    (including decode_tiff) parse the offset bytes as the values."""
    import struct

    import numpy as np

    from datapipelines_spark.operators.tiffcodec import decode_tiff, encode_tiff

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (9, 7, 2)).astype(np.uint8)
    for be in (False, True):
        data = encode_tiff(img, big_endian=be)
        assert np.array_equal(decode_tiff(data), img)


def test_encode_rejects_unsupported_spp():
    import numpy as np
    import pytest

    from datapipelines_spark.operators.tiffcodec import encode_tiff

    with pytest.raises(ValueError):
        encode_tiff(np.zeros((4, 4, 5), dtype=np.uint8))
